"""Host-side crop and augmentation primitives (numpy, uint8 domain).

Behavioral parity targets in /root/reference/utils/image_utils.py:
  * `crop_img` (:58-64) center-crops to a multiple of `base`;
  * `data_augmentation` (:134-165) applies one of 8 dihedral modes
    (flipud / rot90 combinations);
  * `random_augmentation` (:177-182) always picks a mode in 1..7 — the
    identity mode 0 is unreachable in the reference, reproduced here;
  * `crop_patch` (:49-55) random aligned crop (same window for pairs).

All randomness flows through an explicit numpy Generator so the pipeline
is reproducible by construction (the reference uses global `random`).
"""

from __future__ import annotations

import numpy as np


def crop_to_multiple(image: np.ndarray, base: int = 16) -> np.ndarray:
    """Center-crop HWC image so H and W are multiples of `base`."""
    h, w = image.shape[:2]
    ch, cw = h % base, w % base
    return image[ch // 2 : h - ch + ch // 2, cw // 2 : w - cw + cw // 2, :]


def dihedral(image: np.ndarray, mode: int) -> np.ndarray:
    """Apply dihedral transform `mode` in 0..7 (0 = identity)."""
    if mode == 0:
        return image
    if mode == 1:
        return np.flipud(image)
    if mode == 2:
        return np.rot90(image)
    if mode == 3:
        return np.flipud(np.rot90(image))
    if mode == 4:
        return np.rot90(image, k=2)
    if mode == 5:
        return np.flipud(np.rot90(image, k=2))
    if mode == 6:
        return np.rot90(image, k=3)
    if mode == 7:
        return np.flipud(np.rot90(image, k=3))
    raise ValueError(f"invalid augmentation mode {mode}")


def random_augmentation(
    rng: np.random.Generator, *images: np.ndarray
) -> list[np.ndarray]:
    """Apply one shared random mode in 1..7 to every image (never identity,
    matching the reference)."""
    mode = int(rng.integers(1, 8))
    return [np.ascontiguousarray(dihedral(im, mode)) for im in images]


def random_crop(
    rng: np.random.Generator, patch: int, *images: np.ndarray
) -> list[np.ndarray]:
    """Crop the same random patch window from every image."""
    h, w = images[0].shape[:2]
    i = int(rng.integers(0, h - patch + 1))
    j = int(rng.integers(0, w - patch + 1))
    return [im[i : i + patch, j : j + patch] for im in images]
