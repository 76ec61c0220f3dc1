"""Full-depth torch-checkpoint converter coverage for the variant families.

The flagship PromptIR already has a full-depth 548-tensor conversion +
forward golden (tests/test_model_parity.py). These tests extend the
key-space proof to the other trainable families at their REFERENCE
training depths: every tensor of the reference state dict must land in
our flax tree at the exact path and shape through `convert_state_dict`
(values are irrelevant for coverage, so the committed fixtures store only
{key: shape, dtype-kind} — see tools/gen_key_fixtures.py).

Reference configs pinned by the fixtures:
  * PromptXRestormer       /root/reference/train.py:94-108   (707 tensors)
  * PromptXRestormerEff    /root/reference/train.py:177-191  (674 tensors)
  * PromptUformerIR        /root/reference/train.py:62-63    (855 tensors)
  * CAPromptXRestormerEffv2 /root/reference/train_capromptxrestormer.py:30-48
                                                             (1126 tensors)
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptir_tpu.compat.torch_ckpt import check_params_match, convert_state_dict
from promptir_tpu.models import create_model

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

CASES = {
    "promptxrestormerir": dict(
        kwargs=dict(
            num_blocks=(2, 4, 4, 4),
            channel_heads=(1, 1, 1, 1),
            spatial_heads=(1, 2, 4, 8),
        ),
        n_tensors=707,
    ),
    "promptxrestormereffir": dict(
        kwargs=dict(
            num_blocks=(2, 4, 4, 4),
            channel_heads=(1, 1, 1, 1),
            spatial_heads=(1, 2, 4, 8),
        ),
        n_tensors=674,
    ),
    "promptuformerir": dict(kwargs={}, n_tensors=855),
    "capromptxrestormereffv2": dict(
        kwargs=dict(
            num_blocks=(2, 4, 4, 4),
            channel_heads=(1, 1, 1, 1),
            spatial_heads=(1, 2, 4, 8),
        ),
        n_tensors=1126,
    ),
}


def _fabricate_state_dict(name):
    with open(os.path.join(GOLDENS, f"sd_keys_{name}.json")) as f:
        keys = json.load(f)
    sd = {}
    for k, meta in keys.items():
        dt = np.int64 if meta["kind"] in "iu" else np.float32
        sd[k] = np.zeros(meta["shape"], dt)
    return keys, sd


@pytest.mark.parametrize("name", sorted(CASES))
def test_fulldepth_converter_key_coverage(name):
    case = CASES[name]
    keys, sd = _fabricate_state_dict(name)
    assert len(keys) == case["n_tensors"]

    variables = convert_state_dict(sd)

    from promptir_tpu.cli.test import validation_shape

    model = create_model(name, **case["kwargs"])
    init = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros(validation_shape(name))
        )
    )
    # exact tree / shape match, readable diff on failure
    check_params_match(variables, init)

    # and every float tensor of the reference checkpoint was consumed
    # (integer buffers like relative_position_index are recomputed tables)
    n_float = sum(1 for m in keys.values() if m["kind"] == "f")
    n_converted = len(jax.tree.leaves(variables))
    assert n_converted == n_float, (
        f"{n_float - n_converted} float checkpoint tensors were dropped "
        "by the converter"
    )
