"""Image saving/loading helpers (host side).

Parity with the reference's save path (`save_image_tensor`,
/root/reference/utils/image_io.py:157; `np_to_pil` clip*255,
/root/reference/utils/image_utils.py:287-302): clip [0,1], scale by 255,
round via uint8 cast, save PNG.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def to_uint8(img01: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)


def save_image(path: str, img01_hwc: np.ndarray) -> None:
    Image.fromarray(to_uint8(img01_hwc)).save(path)


def load_image01(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.array(im.convert("RGB")).astype(np.float32) / 255.0
