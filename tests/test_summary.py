"""Model-complexity accounting: utils/flops.py + cli/summary.py.

The reference's equivalents are the per-model __main__ smoke blocks and the
hook-based counters in utils_modelsummary.py (net/model.py:383-403); here
the numbers come from XLA's own cost analysis, so the tests pin (a) exact
param counts, (b) a closed-form FLOP check on a single conv, and (c) the
CLI end to end.
"""

import flax.linen as nn
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.utils.flops import count_params, model_cost, summarize


class _OneConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(8, (3, 3), padding="SAME", use_bias=True)(x)


def test_count_params_exact():
    m = _OneConv()
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))))
    assert count_params(v) == 3 * 3 * 3 * 8 + 8


def test_model_cost_flops_closed_form():
    c = model_cost(_OneConv(), (1, 16, 16, 3))
    assert c["params"] == 224
    # XLA counts only real (unpadded) taps for a SAME conv: per spatial dim
    # the effective tap count over 16 outputs of a 3-tap kernel is
    # 14*3 + 2*2 = 46, so MACs = 46^2 * Cin * Cout, plus the bias adds
    macs = 46 * 46 * 3 * 8
    bias_adds = 16 * 16 * 8
    assert c["flops"] == 2 * macs + bias_adds


@pytest.mark.slow
def test_summary_cli_tiny_promptir(capsys):
    from promptir_tpu.cli.summary import main

    main(["--model", "promptir", "--size", "32",
          "--num_blocks", "1", "1", "1", "1"])
    out = capsys.readouterr().out
    assert "promptir @ 1x32x32x3" in out
    assert "#Params" in out and "FLOPs" in out
    # param count line must match count_params of the same config
    from promptir_tpu.models import create_model

    model = create_model("promptir", num_blocks=(1, 1, 1, 1))
    v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    want = count_params(v) / 1e6
    got = float(out.split("#Params :")[1].split("M")[0])
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_summarize_string_shape():
    s = summarize(_OneConv(), (1, 8, 8, 3))
    assert s.startswith("#Params : 0.0002 M")
