"""Model zoo registry.

Mirrors the reference's model selection surface
(/root/reference/train.py:310-326, options `--model`): each entry maps the
reference CLI name to a constructor returning a flax module.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def create_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    try:
        return _REGISTRY[name](**kwargs)
    except TypeError as e:
        if "fused_ffn" in str(e) and kwargs.get("fused_ffn"):
            raise ValueError(
                f"model {name!r} has no fused Pallas path (fused_ffn/"
                "--fused is supported by the PromptIR and X-Restormer "
                "families)"
            ) from e
        raise


def available_models():
    return sorted(_REGISTRY)


# Import model families for registration side-effects.
from promptir_tpu.models import promptir as _promptir  # noqa: E402,F401
from promptir_tpu.models import xrestormer as _xrestormer  # noqa: E402,F401
from promptir_tpu.models import prompt_xrestormer as _pxr  # noqa: E402,F401
from promptir_tpu.models import prompt_xrestormer_eff as _pxre  # noqa: E402,F401
from promptir_tpu.models import prompt_uformer as _pu  # noqa: E402,F401
from promptir_tpu.models import easy_promptxrestormer as _ez  # noqa: E402,F401
from promptir_tpu.models import nafnet as _naf  # noqa: E402,F401
from promptir_tpu.models import camixer_models as _ca  # noqa: E402,F401
from promptir_tpu.models import camixer_prompt_uformer as _capu  # noqa: E402,F401
