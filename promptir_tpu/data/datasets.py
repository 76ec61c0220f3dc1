"""Dataset definitions: sample-id construction and per-sample loading.

Parity targets in /root/reference/utils/dataset_utils.py:
  * `PromptTrainDataset` (:15-175): denoise ids from
    data_dir/noisy/denoise.txt filtered against the denoise dir listing,
    replicated x3 per sigma; derain ids from rainy/rainTrain.txt x120;
    haze ids from hazy/hazy_outside.txt. GT paths are derived by the same
    string surgery (`rainy/rain-X` -> `gt/norain-X` (:109-111);
    `.../synthetic/<n>_<p>.jpg` -> `.../original/<n>.jpg` (:113-118)).
    Denoise samples: center-crop-16 -> random patch crop -> dihedral aug
    -> uint8 noise. Paired samples: joint random crop + aug.
  * `DenoiseTestDataset` (:178-237): clean dir + set_sigma.
  * `DerainDehazeDataset` (:240-300): input/ -> target/ pairs; dehaze GT
    name is the part before '_' (:272-279).
  * `TestSpecificDataset` (:303-341): dir-or-file demo loader.

Loading is host-side numpy/PIL; batching/transfer live in loader.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from promptir_tpu.data.augment import (
    crop_to_multiple,
    random_augmentation,
    random_crop,
)
from promptir_tpu.data.degradations import (
    DE_TYPES,
    SIGMA_BY_TYPE,
    add_gaussian_noise,
)

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


def load_image_rgb(path: str) -> np.ndarray:
    """Load an image file as HWC uint8 RGB.

    PNGs decode through the native C++ reader (zlib + unfilter, GIL
    released — see native/png_decode.cpp); anything it declines (JPEG,
    16-bit, interlaced) falls back to PIL with identical output.
    """
    if path.lower().endswith(".png"):
        from promptir_tpu.data import native

        with open(path, "rb") as f:
            data = f.read()
        out = native.decode_png_rgb(data)
        if out is not None:
            return out
    with Image.open(path) as im:
        return np.array(im.convert("RGB"))


def derain_gt_name(rainy_name: str) -> str:
    """'<root>/rainy/rain-X.png' -> '<root>/gt/norain-X.png'."""
    return rainy_name.split("rainy")[0] + "gt/norain-" + rainy_name.split("rain-")[-1]


def dehaze_gt_name(hazy_name: str) -> str:
    """'.../synthetic/<n>_<params>.jpg' -> '.../original/<n>.jpg'."""
    dir_name = hazy_name.split("synthetic")[0] + "original/"
    name = hazy_name.split("/")[-1].split("_")[0]
    suffix = "." + hazy_name.split(".")[-1]
    return dir_name + name + suffix


@dataclass
class Sample:
    degraded_path: Optional[str]  # None => synthesize from clean
    clean_path: str
    de_type: int


@dataclass
class PromptTrainDataset:
    """Mixed all-in-one training set with reference replication factors.

    `use_native=True` (auto-detected by default) routes the hot per-sample
    crop/dihedral/noise/float path through the C++ kernel in
    native/fused_augment.cpp — same crops and flips, noise from its own
    seeded stream (statistically identical N(0, sigma) in the uint8
    domain).
    """

    data_file_dir: str
    denoise_dir: str
    derain_dir: str
    dehaze_dir: str
    de_type: Sequence[str] = (
        "denoise_15",
        "denoise_25",
        "denoise_50",
        "derain",
        "dehaze",
    )
    patch_size: int = 128
    seed: int = 0
    use_native: Optional[bool] = None
    samples: List[Sample] = field(default_factory=list, init=False)

    def __post_init__(self):
        self.samples = []
        denoise_tasks = [t for t in self.de_type if t.startswith("denoise")]
        if denoise_tasks:
            ref_file = os.path.join(self.data_file_dir, "noisy/denoise.txt")
            wanted = {l.strip() for l in open(ref_file)}
            names = [
                n for n in sorted(os.listdir(self.denoise_dir)) if n in wanted
            ]
            for task in ("denoise_15", "denoise_25", "denoise_50"):
                if task in self.de_type:
                    de_id = DE_TYPES[task]
                    for _ in range(3):  # x3 replication per sigma
                        self.samples += [
                            Sample(None, os.path.join(self.denoise_dir, n), de_id)
                            for n in names
                        ]
        if "derain" in self.de_type:
            rs = os.path.join(self.data_file_dir, "rainy/rainTrain.txt")
            rel = [l.strip() for l in open(rs)]
            for _ in range(120):  # x120 replication
                self.samples += [
                    Sample(
                        self.derain_dir + r,
                        derain_gt_name(self.derain_dir + r),
                        DE_TYPES["derain"],
                    )
                    for r in rel
                ]
        if "dehaze" in self.de_type:
            hz = os.path.join(self.data_file_dir, "hazy/hazy_outside.txt")
            rel = [l.strip() for l in open(hz)]
            self.samples += [
                Sample(
                    self.dehaze_dir + r,
                    dehaze_gt_name(self.dehaze_dir + r),
                    DE_TYPES["dehaze"],
                )
                for r in rel
            ]

    def __len__(self) -> int:
        return len(self.samples)

    def _native(self) -> bool:
        if self.use_native is None:
            from promptir_tpu.data import native

            self.use_native = native.available()
        return bool(self.use_native)

    def get(self, idx: int, rng: np.random.Generator):
        """Returns (de_type, degraded, clean) as float32 HWC in [0,1]."""
        s = self.samples[idx]
        p = self.patch_size
        if s.de_type in SIGMA_BY_TYPE:
            clean = crop_to_multiple(load_image_rgb(s.clean_path), 16)
            if self._native():
                from promptir_tpu.data import native

                h, w = clean.shape[:2]
                ci = int(rng.integers(0, h - p + 1))
                cj = int(rng.integers(0, w - p + 1))
                mode = int(rng.integers(1, 8))
                seed = int(rng.integers(0, 2**63 - 1))
                degraded, clean_patch = native.prepare_denoise_sample(
                    clean, ci, cj, p, mode, SIGMA_BY_TYPE[s.de_type], seed
                )
                return s.de_type, degraded, clean_patch
            (clean_patch,) = random_crop(rng, p, clean)
            clean_patch = random_augmentation(rng, clean_patch)[0]
            degraded = add_gaussian_noise(
                rng, clean_patch, SIGMA_BY_TYPE[s.de_type]
            )
        else:
            degraded_img = crop_to_multiple(load_image_rgb(s.degraded_path), 16)
            clean_img = crop_to_multiple(load_image_rgb(s.clean_path), 16)
            if self._native():
                from promptir_tpu.data import native

                h, w = degraded_img.shape[:2]
                ci = int(rng.integers(0, h - p + 1))
                cj = int(rng.integers(0, w - p + 1))
                mode = int(rng.integers(1, 8))
                degraded, clean_patch = native.prepare_paired_sample(
                    degraded_img, clean_img, ci, cj, p, mode
                )
                return s.de_type, degraded, clean_patch
            degraded, clean_patch = random_crop(
                rng, p, degraded_img, clean_img
            )
            degraded, clean_patch = random_augmentation(rng, degraded, clean_patch)
        return (
            s.de_type,
            degraded.astype(np.float32) / 255.0,
            clean_patch.astype(np.float32) / 255.0,
        )


@dataclass
class DenoiseTestDataset:
    """Clean test dir (BSD68/Urban100); noise added at fetch time."""

    denoise_path: str
    sigma: float = 15.0
    seed: int = 0

    def __post_init__(self):
        # The reference lists the whole dir (dataset_utils.py:190-191); we
        # additionally filter to image files so stray files don't crash.
        self.clean_ids = [
            os.path.join(self.denoise_path, n)
            for n in sorted(os.listdir(self.denoise_path))
            if n.lower().endswith(IMAGE_EXTENSIONS)
        ]

    def set_sigma(self, sigma: float):
        self.sigma = sigma

    def __len__(self):
        return len(self.clean_ids)

    def get(self, idx: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng(self.seed + idx)
        clean = crop_to_multiple(load_image_rgb(self.clean_ids[idx]), 16)
        noisy = add_gaussian_noise(rng, clean, self.sigma)
        name = os.path.basename(self.clean_ids[idx]).rsplit(".", 1)[0]
        return (
            name,
            noisy.astype(np.float32) / 255.0,
            clean.astype(np.float32) / 255.0,
        )


@dataclass
class DerainDehazeDataset:
    """Paired input/ -> target/ test sets (Rain100L, SOTS outdoor)."""

    derain_path: str = ""
    dehaze_path: str = ""
    task: str = "derain"
    addnoise: bool = False
    sigma: Optional[float] = None
    seed: int = 0

    def __post_init__(self):
        self.set_dataset(self.task)

    def set_dataset(self, task: str):
        self.task = task
        root = self.derain_path if task == "derain" else self.dehaze_path
        self.ids = [
            os.path.join(root, "input", n)
            for n in sorted(os.listdir(os.path.join(root, "input")))
        ]

    def _gt_path(self, degraded: str) -> str:
        if self.task == "derain":
            return degraded.replace("input", "target")
        dir_name = degraded.split("input")[0] + "target/"
        name = degraded.split("/")[-1].split("_")[0] + ".png"
        return dir_name + name

    def __len__(self):
        return len(self.ids)

    def get(self, idx: int, rng: Optional[np.random.Generator] = None):
        degraded = crop_to_multiple(load_image_rgb(self.ids[idx]), 16)
        if self.addnoise:
            rng = rng or np.random.default_rng(self.seed + idx)
            degraded = add_gaussian_noise(rng, degraded, self.sigma)
        clean = crop_to_multiple(load_image_rgb(self._gt_path(self.ids[idx])), 16)
        name = os.path.basename(self.ids[idx])[:-4]
        return (
            name,
            degraded.astype(np.float32) / 255.0,
            clean.astype(np.float32) / 255.0,
        )


@dataclass
class TestSpecificDataset:
    """Demo loader: a directory of images or a single image file."""

    test_path: str

    def __post_init__(self):
        if os.path.isdir(self.test_path):
            names = [
                n
                for n in sorted(os.listdir(self.test_path))
                if n.lower().endswith(IMAGE_EXTENSIONS)
            ]
            if not names:
                raise FileNotFoundError(
                    f"no image files in directory {self.test_path}"
                )
            self.ids = [os.path.join(self.test_path, n) for n in names]
        elif self.test_path.lower().endswith(IMAGE_EXTENSIONS):
            self.ids = [self.test_path]
        else:
            raise ValueError("test_path must be an image file or directory")

    def __len__(self):
        return len(self.ids)

    def get(self, idx: int):
        img = crop_to_multiple(load_image_rgb(self.ids[idx]), 16)
        name = os.path.basename(self.ids[idx]).rsplit(".", 1)[0]
        return name, img.astype(np.float32) / 255.0
