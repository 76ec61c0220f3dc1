"""Evaluation loops: the framework's `test_Denoise` / `test_Derain_Dehaze`.

Parity targets: /root/reference/test.py:84-164 — per-image loop, flip-pad
to a multiple of 64, forward, crop back, PSNR/SSIM via AverageMeter, and
optional PNG dumps of the restored images.

TPU notes: the forward runs jitted; padded shapes are bucketed by the
flip-pad (every BSD68/Rain100L image lands on a handful of 64-multiples,
so recompiles are rare and cached). Metrics are computed on-device.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from promptir_tpu.eval.metrics import AverageMeter, psnr_ssim
from promptir_tpu.eval.padding import pad_to_multiple_flip
from promptir_tpu.utils.image_io import save_image


def _restore_padded(model_fn, params, degraded: jnp.ndarray, pad_base: int):
    _, h, w, _ = degraded.shape
    x = pad_to_multiple_flip(degraded, pad_base)
    y = model_fn(params, x)
    return jnp.clip(y[:, :h, :w, :], 0.0, 1.0)


def run_eval(
    model_fn: Callable,
    params,
    dataset,
    output_dir: Optional[str] = None,
    pad_base: int = 64,
    tag: str = "",
) -> dict:
    """Evaluate `model_fn(params, NHWC)->NHWC` over a test dataset.

    Returns {"psnr": mean, "ssim": mean, "n": count}.
    """
    psnr_m, ssim_m = AverageMeter(), AverageMeter()
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    for i in range(len(dataset)):
        name, degraded, clean = dataset.get(i)
        restored = _restore_padded(
            model_fn, params, jnp.asarray(degraded[None]), pad_base
        )
        p, s = psnr_ssim(jnp.asarray(clean[None]), restored)
        psnr_m.update(float(p[0]), 1)
        ssim_m.update(float(s[0]), 1)
        if output_dir:
            save_image(
                os.path.join(output_dir, f"{name}.png"),
                np.asarray(restored[0]),
            )
    return {"psnr": psnr_m.avg, "ssim": ssim_m.avg, "n": psnr_m.count}


def run_eval_nopad(
    model_fn: Callable,
    params,
    dataset,
    json_path: Optional[str] = None,
    output_dir: Optional[str] = None,
) -> dict:
    """No-padding per-image eval with a per-image PSNR JSON dump — the
    reference's `test_promptir.py` flavor (forward at native size since
    crop-16 already applied; psnr_dict saved for A/B comparison,
    test_promptir.py:64-86,114-123)."""
    import json

    psnr_m, ssim_m = AverageMeter(), AverageMeter()
    psnr_dict = {}
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    for i in range(len(dataset)):
        name, degraded, clean = dataset.get(i)
        restored = jnp.clip(
            model_fn(params, jnp.asarray(degraded[None])), 0.0, 1.0
        )
        p, s = psnr_ssim(jnp.asarray(clean[None]), restored)
        psnr_dict[name] = float(p[0])
        psnr_m.update(float(p[0]), 1)
        ssim_m.update(float(s[0]), 1)
        if output_dir:
            save_image(
                os.path.join(output_dir, f"{name}.png"),
                np.asarray(restored[0]),
            )
    if json_path:
        os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
        with open(json_path, "w") as f:
            json.dump(psnr_dict, f, indent=1)
    return {
        "psnr": psnr_m.avg,
        "ssim": ssim_m.avg,
        "n": psnr_m.count,
        "per_image": psnr_dict,
    }


def test_denoise(
    model_fn, params, dataset, sigma: float, output_dir=None, pad_base=64
) -> dict:
    """Reference `test_Denoise(opt, net, dataset, sigma)` (test.py:84-117)."""
    dataset.set_sigma(sigma)
    out = None if output_dir is None else os.path.join(
        output_dir, f"denoise_{int(sigma)}"
    )
    r = run_eval(model_fn, params, dataset, out, pad_base)
    print(f"Denoise sigma={int(sigma)}: psnr: {r['psnr']:.2f}, ssim: {r['ssim']:.4f}")
    return r


def test_derain_dehaze(
    model_fn, params, dataset, task: str = "derain", output_dir=None, pad_base=64
) -> dict:
    """Reference `test_Derain_Dehaze` (test.py:121-164)."""
    dataset.set_dataset(task)
    out = None if output_dir is None else os.path.join(output_dir, task)
    r = run_eval(model_fn, params, dataset, out, pad_base)
    print(f"{task}: psnr: {r['psnr']:.2f}, ssim: {r['ssim']:.4f}")
    return r


def make_epoch_eval_hook(
    denoise_path: Optional[str] = None,
    derain_path: Optional[str] = None,
    sigma: float = 15.0,
    pad_base: int = 64,
):
    """Epoch-end evaluation hook for `Trainer(eval_hook=...)` — the
    reference's `EvaluationCallback.on_train_epoch_end` (train.py:134-172):
    BSD68 sigma-15 PSNR/SSIM + Rain100L PSNR/SSIM logged to the run logger
    every epoch. Returns a callable `(eval_step, params) -> metrics dict`;
    pass either path as None to skip that set."""
    from promptir_tpu.data.datasets import (
        DenoiseTestDataset,
        DerainDehazeDataset,
    )

    denoise_ds = (
        DenoiseTestDataset(denoise_path, sigma=sigma) if denoise_path else None
    )
    derain_ds = (
        DerainDehazeDataset(derain_path=derain_path) if derain_path else None
    )

    def hook(eval_step, params) -> dict:
        metrics = {}
        if denoise_ds is not None:
            r = test_denoise(
                eval_step, params, denoise_ds, sigma, pad_base=pad_base
            )
            metrics[f"eval_psnr_denoise{int(sigma)}"] = r["psnr"]
            metrics[f"eval_ssim_denoise{int(sigma)}"] = r["ssim"]
        if derain_ds is not None:
            r = test_derain_dehaze(
                eval_step, params, derain_ds, "derain", pad_base=pad_base
            )
            metrics["eval_psnr_derain"] = r["psnr"]
            metrics["eval_ssim_derain"] = r["ssim"]
        return metrics

    return hook
