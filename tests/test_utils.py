"""Utility parity: MATLAB imresize, gaussian SSIM, patch slice/splice."""

import numpy as np
import jax.numpy as jnp
import pytest

from promptir_tpu.data.patches import (
    slice_image_to_patches,
    splice_patches_to_image,
)
from promptir_tpu.eval.metrics import compute_niqe, gaussian_ssim
from promptir_tpu.utils.imresize import imresize

GOLD = "tests/goldens"


@pytest.mark.parametrize("scale", [0.5, 2.0, 1.3])
def test_imresize_matches_reference(scale):
    d = np.load(f"{GOLD}/imresize.npz")
    out = imresize(d["img"], scale=scale)
    np.testing.assert_allclose(out, d[f"scale_{scale}"], rtol=1e-9, atol=1e-9)


def test_gaussian_ssim_matches_reference():
    d = np.load(f"{GOLD}/gaussian_ssim.npz")
    a = d["a"].transpose(0, 2, 3, 1)
    b = d["b"].transpose(0, 2, 3, 1)
    val = float(jnp.mean(gaussian_ssim(jnp.asarray(a), jnp.asarray(b))))
    assert val == pytest.approx(float(d["val"]), abs=2e-5)


def test_patch_slice_splice_roundtrip():
    img = np.random.default_rng(0).uniform(size=(64, 128, 3)).astype(np.float32)
    for overlap in (0, 8):
        p = slice_image_to_patches(img, 32, overlap)
        assert p.shape == (2 * 4, 32 + overlap, 32 + overlap, 3)
        back = splice_patches_to_image(p, img.shape, overlap)
        np.testing.assert_array_equal(back, img)


def test_niqe_gated():
    # without a fitted pristine model (and no skvideo) the error explains
    # how to fit one; with either present, any numeric result is fine
    try:
        compute_niqe(np.zeros((128, 128, 3)))
    except NotImplementedError as e:
        assert "fit" in str(e)
    except Exception:
        pass


def test_niqe_committed_model_out_of_box():
    """The package ships a fitted pristine model (eval/niqe_model.npz, fit
    on a generated clean corpus via cli/fit_niqe) so `compute_niqe` works
    with zero optional deps and orders degradations correctly."""
    import os

    from promptir_tpu.data.synthetic import synth_clean_image
    from promptir_tpu.eval.niqe import _default_model_path, niqe

    assert os.path.exists(_default_model_path())
    clean = synth_clean_image(424242, 224, 224).astype(np.float64) / 255.0
    rng = np.random.default_rng(0)
    noisy = np.clip(clean + rng.normal(0, 50 / 255.0, clean.shape), 0, 1)
    assert niqe(noisy) > niqe(clean)