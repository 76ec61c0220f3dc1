"""Goldens for utility parity: MATLAB imresize and gaussian SSIM.

Usage: python tools/gen_goldens_utils.py
"""
import sys
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from utils.imresize import imresize as ref_imresize
from utils.pytorch_ssim import ssim as ref_ssim

rng = np.random.default_rng(7)
img = rng.uniform(0, 1, (37, 53, 3))

cases = {}
for scale in (0.5, 2.0, 1.3):
    cases[f"scale_{scale}"] = ref_imresize(img, scale_factor=scale)
np.savez_compressed(
    "tests/goldens/imresize.npz", img=img,
    **{k: v for k, v in cases.items()},
)
print("imresize:", {k: v.shape for k, v in cases.items()})

a = rng.uniform(0, 1, (2, 3, 32, 40)).astype(np.float32)
b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
val = float(ref_ssim(torch.from_numpy(a), torch.from_numpy(b)))
np.savez_compressed("tests/goldens/gaussian_ssim.npz", a=a, b=b,
                    val=np.float64(val))
print("gaussian ssim:", val)
