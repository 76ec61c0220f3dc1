"""PSNR / SSIM with scikit-image semantics, computed on-device.

Parity target: /root/reference/utils/val_utils.py:50-66 — the reference
clips both images to [0,1] and calls skimage `peak_signal_noise_ratio
(data_range=1)` and `structural_similarity(data_range=1, channel_axis=2)`.
All published baseline numbers are in these semantics, so this module
reproduces them exactly:

  * PSNR = 10*log10(data_range^2 / mse), mse over all pixels+channels.
  * SSIM: per-channel 2D SSIM with a 7x7 *uniform* window (skimage default
    gaussian_weights=False), unbiased covariance normalization
    cov_norm = N/(N-1) with N=49, C1=(0.01*L)^2, C2=(0.03*L)^2, and the
    result mean taken over the valid region (skimage crops (win-1)/2=3
    border pixels); channel mean last.

Implemented with `lax.reduce_window` VALID windows — a cropped uniform
filter is exactly a VALID mean filter — so the whole metric jits and runs
batched on TPU (the reference round-trips every image to CPU for skimage).

Also provides `AverageMeter` (val_utils.py:8-26) for harness parity.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def psnr(clean: jnp.ndarray, restored: jnp.ndarray, data_range: float = 1.0):
    """skimage-compatible PSNR per batch element. Inputs NHWC, pre-clipped."""
    err = jnp.mean(
        jnp.square(clean.astype(jnp.float32) - restored.astype(jnp.float32)),
        axis=(1, 2, 3),
    )
    return 10.0 * jnp.log10((data_range * data_range) / err)


def _window_mean(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """VALID uniform-window mean over H,W of an NHWC tensor."""
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, win, win, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return s / (win * win)


def ssim(
    clean: jnp.ndarray,
    restored: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """skimage-compatible multichannel SSIM per batch element (NHWC)."""
    x = clean.astype(jnp.float32)
    y = restored.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)  # unbiased sample (co)variance

    ux = _window_mean(x, win_size)
    uy = _window_mean(y, win_size)
    uxx = _window_mean(x * x, win_size)
    uyy = _window_mean(y * y, win_size)
    uxy = _window_mean(x * y, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # VALID windows already exclude the border skimage crops; mean over
    # spatial positions per channel, then over channels.
    return jnp.mean(s, axis=(1, 2, 3))


@jax.jit
def psnr_ssim(clean: jnp.ndarray, restored: jnp.ndarray):
    """Clip to [0,1] then compute both metrics (reference semantics)."""
    c = jnp.clip(clean, 0.0, 1.0)
    r = jnp.clip(restored, 0.0, 1.0)
    return psnr(c, r), ssim(c, r)


def compute_psnr_ssim(restored, clean):
    """Reference-shaped helper: returns (mean_psnr, mean_ssim, batch)."""
    p, s = psnr_ssim(jnp.asarray(clean), jnp.asarray(restored))
    n = int(p.shape[0])
    return float(jnp.mean(p)), float(jnp.mean(s)), n


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = jnp.exp(
        -jnp.square(jnp.arange(size, dtype=jnp.float32) - size // 2)
        / (2.0 * sigma * sigma)
    )
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def gaussian_ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Gaussian-window SSIM matching the reference's standalone torch SSIM
    (/root/reference/utils/pytorch_ssim/__init__.py:45-78): 11x11 gaussian
    window, SAME padding (borders included), per-channel depthwise filter,
    mean over everything. Inputs NHWC in [0,1]; returns per-batch SSIM."""
    w = _gaussian_window(window_size, sigma)
    c = img1.shape[-1]
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1, mu2 = filt(x), filt(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(x * x) - mu1_sq
    s2 = filt(y * y) - mu2_sq
    s12 = filt(x * y) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(m, axis=(1, 2, 3))


def compute_niqe(image, model=None) -> float:
    """NIQE (reference utils/val_utils.py:69-74 via skvideo).

    Runs our own implementation of the published algorithm
    (promptir_tpu/eval/niqe.py). The pristine multivariate-Gaussian model
    is not redistributable, so either pass `model`, fit one with
    `fit_niqe_model` / `python -m promptir_tpu.cli.fit_niqe`, or — when
    skvideo happens to be installed — its bundled parameters are used for
    score parity with the reference."""
    import numpy as np

    arr = np.clip(np.asarray(image), 0, 1)
    from promptir_tpu.eval import niqe as _niqe

    if model is None and not os.path.exists(_niqe._default_model_path()):
        try:
            from skvideo.measure import niqe as sk_niqe  # type: ignore

            return float(sk_niqe(arr).mean())
        except ImportError:
            pass  # fall through to our implementation's error message
    return _niqe.niqe(arr, model=model)


class Timer:
    """Accumulating wall-clock timer (reference utils/val_utils.py:76-97):
    `tic` marks a start, `toc` reads the elapsed span, `hold` accumulates
    it, `release` returns-and-clears the accumulator."""

    def __init__(self):
        self.acc = 0.0
        self.tic()

    def tic(self):
        import time

        self.t0 = time.perf_counter()

    def toc(self) -> float:
        import time

        return time.perf_counter() - self.t0

    def hold(self):
        self.acc += self.toc()

    def release(self) -> float:
        ret = self.acc
        self.acc = 0.0
        return ret

    def reset(self):
        self.acc = 0.0


class AverageMeter:
    """Running average tracker (reference utils/val_utils.py:8-26)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
