"""End-to-end checkpoint conversion: torch .ckpt -> npz -> model forward."""

import pytest
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow
def test_convert_cli_roundtrip(golden, tmp_path):
    import torch

    g = golden("promptir_small")
    # wrap the golden state dict as a Lightning-style checkpoint
    ckpt = {
        "state_dict": {
            f"net.{k}": torch.from_numpy(np.asarray(v))
            for k, v in g.state_dict.items()
        }
    }
    ckpt_path = str(tmp_path / "model.ckpt")
    torch.save(ckpt, ckpt_path)

    npz_path = str(tmp_path / "params.npz")
    from promptir_tpu.cli.convert import main as convert_main

    convert_main([ckpt_path, npz_path, "--num_blocks", "1", "1", "1", "1",
                  "--skip_check"])

    from promptir_tpu.models import create_model
    from promptir_tpu.train.checkpoints import load_params_npz

    # note: the golden model used num_refinement_blocks=1
    model = create_model(
        "promptir", num_blocks=(1, 1, 1, 1), num_refinement_blocks=1
    )
    params = load_params_npz(npz_path)
    y = model.apply({"params": params}, jnp.asarray(g.x_nhwc))
    np.testing.assert_allclose(np.asarray(y), g.y_nhwc, rtol=5e-5, atol=5e-5)


def test_check_params_match_readable_errors():
    """A wrong/bogus state dict must fail with a message that lists the
    missing paths, unexpected paths, and shape mismatches by name (the
    debugging surface for anyone porting a reference .ckpt)."""
    import pytest

    from promptir_tpu.compat.torch_ckpt import check_params_match

    good = {"params": {"conv": {"kernel": jnp.zeros((3, 3, 3, 8)),
                                "bias": jnp.zeros((8,))},
                       "norm": {"scale": jnp.zeros((8,))}}}
    # missing norm/scale, unexpected extra/w, wrong-shape conv/kernel
    bogus = {"params": {"conv": {"kernel": jnp.zeros((1, 1, 3, 8)),
                                 "bias": jnp.zeros((8,))},
                        "extra": {"w": jnp.zeros((2,))}}}
    with pytest.raises(ValueError) as ei:
        check_params_match(bogus, good)
    msg = str(ei.value)
    assert "missing from checkpoint (1)" in msg and "norm/scale" in msg
    assert "unexpected in checkpoint (1)" in msg and "extra/w" in msg
    assert "shape mismatches" in msg and "conv/kernel" in msg
    assert "(1, 1, 3, 8)" in msg and "(3, 3, 3, 8)" in msg

    # identical trees pass silently
    check_params_match(good, good)


def test_cli_test_load_params_rejects_mismatched_ckpt(tmp_path):
    """cli/test.py:load_params must fail at load time with the readable
    missing/unexpected-path diff (check_params_match) when the torch ckpt
    does not fit the --model config — not with a cryptic flax apply error
    mid-eval."""
    import pytest
    import torch

    from promptir_tpu.cli.test import load_params
    from promptir_tpu.models import create_model

    path = str(tmp_path / "bogus.ckpt")
    torch.save({"state_dict": {"net.bogus.weight": torch.zeros(3, 3)}}, path)
    model = create_model(
        "promptir", num_blocks=(1, 1, 1, 1), num_refinement_blocks=1
    )
    with pytest.raises(ValueError) as ei:
        load_params(model, path)
    msg = str(ei.value)
    assert "missing from checkpoint" in msg
    assert "unexpected in checkpoint" in msg and "bogus" in msg
