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


def test_init_weights_helpers():
    """normal/xavier/kaiming/orthogonal re-initializers (reference
    utils/image_utils.py:185-252): kernels only, exact torch statistics,
    unknown types rejected."""
    import jax
    import jax.numpy as jnp

    from promptir_tpu.utils.init import init_weights

    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 32)), "bias": jnp.zeros((32,))},
        "dense": {"kernel": jnp.zeros((64, 8))},
        "norm": {"weight": jnp.ones((16,))},
    }
    fan_in = 3 * 3 * 16
    p = init_weights(params, "normal", jax.random.PRNGKey(1))
    k = np.asarray(p["conv"]["kernel"])
    assert 0.0 <= k.min() and k.max() <= 0.02  # torch init.uniform(0, 0.02)
    assert float(np.abs(np.asarray(p["conv"]["bias"])).max()) == 0.0
    assert float(np.asarray(p["norm"]["weight"]).min()) == 1.0  # untouched

    p = init_weights(params, "kaiming", jax.random.PRNGKey(2))
    std = float(np.asarray(p["conv"]["kernel"]).std())
    assert abs(std - (2.0 / fan_in) ** 0.5) < 0.01

    p = init_weights(params, "xavier", jax.random.PRNGKey(3))
    std = float(np.asarray(p["conv"]["kernel"]).std())
    assert abs(std - (2.0 / (fan_in + 2 * 9 * 16)) ** 0.5) < 0.01

    p = init_weights(params, "orthogonal", jax.random.PRNGKey(4))
    flat = np.asarray(p["conv"]["kernel"]).transpose(3, 2, 0, 1).reshape(32, -1)
    np.testing.assert_allclose(flat @ flat.T, np.eye(32), atol=1e-5)

    import pytest

    with pytest.raises(NotImplementedError, match="bogus"):
        init_weights(params, "bogus")


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