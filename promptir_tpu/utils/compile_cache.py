"""Persistent XLA compilation cache.

The TPU relay in this environment compiles remotely
(PALLAS_AXON_REMOTE_COMPILE); fresh program shapes can take minutes.
Persisting compiled executables across processes makes every entry point
after the first (bench, CLIs, the driver's compile checks) start in
seconds instead.

CPU-only processes skip the cache: this build's remotely-produced CPU
executables can carry machine features the local host lacks (the AOT
loader warns about possible SIGILL), and CPU compiles are cheap anyway.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "jax")


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Point JAX at an on-disk compilation cache. Returns True if enabled.

    Honors PROMPTIR_COMPILE_CACHE (path; "0"/"off" disables). No-op when
    the default backend is CPU (see module docstring).
    """
    import jax

    env = os.environ.get("PROMPTIR_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return False
    path = cache_dir or env or os.path.abspath(_DEFAULT_DIR)
    try:
        if jax.default_backend() == "cpu":
            return False
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
