"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding logic (DP psum, halo exchange) is validated on a
virtual CPU mesh, the standard JAX pattern for testing pjit/shard_map
without real TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import jax
import numpy as np
import pytest

# The environment's TPU plugin force-selects itself via sitecustomize even
# when JAX_PLATFORMS=cpu is in the env; override in-process (before any
# backend is touched) so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# This JAX build computes convs/dots at reduced precision by default even on
# CPU; parity tests need true float32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache for the CPU test runs. The sharded full-model
# tests (tests/test_halo.py, @slow) each cost a 10-25 minute XLA CPU
# compile on this 1-core host; caching makes every run after the first
# start in seconds. A dedicated CPU-only directory (distinct from the TPU
# relay cache used by utils/compile_cache.py) keeps locally-produced CPU
# executables separate from remotely-compiled ones.
_cpu_cache = pathlib.Path(__file__).parent.parent / ".cache" / "jax-cpu-tests"
try:
    _cpu_cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cpu_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


class Golden:
    """A reference-generated parity fixture: input, output, state dict."""

    def __init__(self, name: str):
        self._name = name
        data = np.load(GOLDEN_DIR / f"{name}.npz")
        self.x = data["x"]  # NCHW float32
        self.y = data["y"]  # NCHW float32
        # big fixtures store weights as fp16 (values chosen fp16-exact by
        # the generator); promote to fp32 for use
        self.state_dict = {
            k[len("sd::"):]: data[k].astype(np.float32)
            for k in data.files
            if k.startswith("sd::")
        }

    @property
    def cond_nhwc(self):
        data = np.load(GOLDEN_DIR / f"{self._name}.npz")
        if "cond" not in data.files:
            return None
        return data["cond"].transpose(0, 2, 3, 1)

    @property
    def x_nhwc(self):
        return self.x.transpose(0, 2, 3, 1)

    @property
    def y_nhwc(self):
        return self.y.transpose(0, 2, 3, 1)


@pytest.fixture
def golden():
    return Golden
