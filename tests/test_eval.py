"""Tests for metrics, padding, and tiled inference."""

import jax.numpy as jnp
import numpy as np
import pytest

from promptir_tpu.eval.metrics import AverageMeter, psnr, psnr_ssim, ssim
from promptir_tpu.eval.padding import (
    crop,
    pad_to_multiple_flip,
    pad_to_multiple_reflect,
)
from promptir_tpu.eval.tiling import tile_positions, tiled_inference


def _ssim_scipy(x, y, data_range=1.0, win=7):
    """Independent reference implementation of skimage SSIM semantics
    (uniform 7x7 filter, unbiased covariances, crop (win-1)//2, channel
    mean) using scipy, for cross-validation."""
    from scipy.ndimage import uniform_filter

    pad = (win - 1) // 2
    npix = win * win
    cov_norm = npix / (npix - 1)
    chans = []
    for ch in range(x.shape[-1]):
        xc, yc = x[..., ch].astype(np.float64), y[..., ch].astype(np.float64)
        ux = uniform_filter(xc, win)
        uy = uniform_filter(yc, win)
        uxx = uniform_filter(xc * xc, win)
        uyy = uniform_filter(yc * yc, win)
        uxy = uniform_filter(xc * yc, win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        chans.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(chans))


def test_psnr_known_value():
    rng = np.random.default_rng(0)
    clean = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    noisy = np.clip(clean + 0.1 * rng.normal(size=clean.shape), 0, 1).astype(
        np.float32
    )
    p = np.asarray(psnr(jnp.asarray(clean), jnp.asarray(noisy)))
    mse = ((clean - noisy) ** 2).reshape(2, -1).mean(axis=1)
    np.testing.assert_allclose(p, 10 * np.log10(1.0 / mse), rtol=1e-5)


def test_ssim_matches_scipy_reference():
    rng = np.random.default_rng(1)
    clean = rng.uniform(size=(41, 37, 3)).astype(np.float32)
    noisy = np.clip(clean + 0.05 * rng.normal(size=clean.shape), 0, 1).astype(
        np.float32
    )
    ours = float(
        np.asarray(ssim(jnp.asarray(clean[None]), jnp.asarray(noisy[None])))[0]
    )
    ref = _ssim_scipy(clean, noisy)
    assert abs(ours - ref) < 1e-5


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 16, 16, 3)))
    assert float(ssim(x, x)[0]) == pytest.approx(1.0, abs=1e-6)


def test_flip_pad_semantics():
    # torch.cat([x, flip(x)])[:H] appends the reversed tail
    x = np.arange(5 * 6 * 1, dtype=np.float32).reshape(1, 5, 6, 1)
    y = np.asarray(pad_to_multiple_flip(jnp.asarray(x), base=8))
    assert y.shape == (1, 8, 8, 1)
    np.testing.assert_array_equal(y[0, 5, :6, 0], x[0, 4, :, 0])  # flipped row 0 is last row
    np.testing.assert_array_equal(y[0, 6, :6, 0], x[0, 3, :, 0])
    np.testing.assert_array_equal(y[0, :5, 6, 0], y[0, :5, 5, 0])  # flip col


def test_reflect_pad_matches_numpy():
    x = np.random.default_rng(3).normal(size=(1, 13, 10, 3)).astype(np.float32)
    y = np.asarray(pad_to_multiple_reflect(jnp.asarray(x), base=8))
    ref = np.pad(x, ((0, 0), (0, 3), (0, 6), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(y, ref)


def test_tile_positions_match_reference():
    # reference: range(0, h-tile, stride) + [h-tile] (demo.py:31-32)
    assert tile_positions(300, 128, 96) == [0, 96, 172]
    assert tile_positions(128, 128, 96) == [0]
    assert tile_positions(100, 128, 96) == [0]
    assert tile_positions(256, 128, 96) == [0, 96, 128]


def test_tiled_inference_identity_model():
    def ident(params, x):
        return x

    x = np.random.default_rng(4).uniform(size=(1, 300, 280, 3)).astype(
        np.float32
    )
    y = np.asarray(
        tiled_inference(ident, None, jnp.asarray(x), tile=128, overlap=32)
    )
    np.testing.assert_allclose(y, np.clip(x, 0, 1), rtol=1e-6, atol=1e-6)


def test_tiled_inference_small_image():
    def ident(params, x):
        return x

    x = np.random.default_rng(5).uniform(size=(1, 60, 50, 3)).astype(np.float32)
    y = np.asarray(tiled_inference(ident, None, jnp.asarray(x)))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, np.clip(x, 0, 1), rtol=1e-6)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert m.avg == pytest.approx(2.0)
    assert m.count == 3


def test_timer_hold_release():
    from promptir_tpu.eval.metrics import Timer

    t = Timer()
    t.tic()
    assert t.toc() >= 0.0
    t.hold()
    t.tic()
    t.hold()
    acc = t.release()
    assert acc >= 0.0
    assert t.release() == 0.0  # release clears the accumulator
    t.hold()
    t.reset()
    assert t.acc == 0.0


# ---- NIQE (own implementation + fit tooling, eval/niqe.py) ----


def test_niqe_ggd_fit_recovers_gaussian():
    from promptir_tpu.eval.niqe import _aggd_fit, _ggd_fit

    rng = np.random.default_rng(0)
    vec = rng.normal(0, 2.0, 200000)
    alpha, sigma_sq = _ggd_fit(vec)
    assert abs(alpha - 2.0) < 0.1  # Gaussian -> shape 2
    assert abs(sigma_sq - 4.0) < 0.1
    a, mean, lv, rv = _aggd_fit(vec)
    assert abs(a - 2.0) < 0.15
    assert abs(mean) < 0.05
    assert abs(lv - rv) < 0.2


def test_niqe_fit_and_score_orders_degradations(tmp_path):
    from promptir_tpu.data.synthetic import synth_clean_image
    from promptir_tpu.eval.niqe import (
        fit_niqe_model,
        load_niqe_model,
        niqe,
        save_niqe_model,
    )

    def gray(seed):
        rgb = synth_clean_image(seed, 192, 192).astype(np.float64)
        return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]

    model = fit_niqe_model([gray(s) for s in range(6)])
    p = str(tmp_path / "m.npz")
    save_niqe_model(p, model)
    model = load_niqe_model(p)

    clean = synth_clean_image(99, 192, 192).astype(np.float64) / 255.0
    rng = np.random.default_rng(1)
    noisy = np.clip(clean + rng.normal(0, 50 / 255.0, clean.shape), 0, 1)
    s_clean = niqe(clean, model=model)
    s_noisy = niqe(noisy, model=model)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean, (s_noisy, s_clean)


def test_compute_niqe_gate_message():
    import pytest

    from promptir_tpu.eval.metrics import compute_niqe

    img = np.zeros((128, 128, 3), np.float32)
    try:
        compute_niqe(img)
    except NotImplementedError as e:
        assert "fit" in str(e)
    else:  # a model file or skvideo exists in this environment
        pass
