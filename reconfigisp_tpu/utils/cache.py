"""Persistent XLA compilation cache.

Native-op supernet search steps compile for 10-20 minutes on the TPU
backend (and 1-3 minutes on CPU); the reference pays torch's eager
dispatch instead and has no analog.  JAX can persist compiled
executables keyed by HLO hash + platform, so repeat runs (benchmarks,
rehearsals, resumed searches, the test suite) skip compilation
entirely.  This must be configured before the first backend use.

Disabled by setting RECONFIGISP_CACHE_DIR=0/off/none.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "reconfigisp_tpu", "xla")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 5.0) -> str | None:
    """Point jax at a persistent compilation cache directory.

    Returns the directory in use, or None if disabled/unsupported.
    Only compiles slower than `min_compile_secs` are persisted, so tiny
    programs don't churn the cache.  Safe to call more than once.
    """
    env = os.environ.get("RECONFIGISP_CACHE_DIR")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return None
    path = cache_dir or env or _DEFAULT_DIR
    try:
        import jax
        # The CPU AOT loader in this XLA build warns about machine-feature
        # mismatches (SIGILL risk) when reloading cached executables, and
        # CPU compiles are minutes at worst — only cache for accelerator
        # backends unless explicitly opted in via RECONFIGISP_CACHE_CPU=1.
        if (jax.config.jax_platforms or "").strip() == "cpu" \
                and os.environ.get("RECONFIGISP_CACHE_CPU") != "1":
            return None
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:  # flag drift across jax versions
        return None
    return path
