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


def _accelerator_plugin_present() -> bool:
    """True if a PJRT accelerator plugin is discoverable WITHOUT initializing
    any backend (backend init can block for minutes when a device tunnel is
    down — see the verify notes).  jax discovers plugins from the
    `jax_plugins` namespace package and the `jax_plugins` entry-point group;
    checking those mirrors its default-backend choice closely enough for the
    cache on/off decision."""
    try:
        # out-of-tree plugins (axon, cuda, rocm, ...) register a backend
        # factory at import/sitecustomize time; 'cpu' is built in and 'tpu'
        # is registered unconditionally with fail_quietly (it only works
        # when local TPU chips exist — checked below via the PCI scan)
        from jax._src import xla_bridge as _xb
        if set(_xb._backend_factories) - {"cpu", "tpu"}:
            return True
    except Exception:
        pass
    try:
        from jax._src import hardware_utils as _hw
        n_chips, _ = _hw.num_available_tpu_chips_and_device_id()
        if n_chips:
            return True
    except Exception:
        pass
    try:
        import pkgutil

        import jax_plugins  # namespace package PJRT plugins install into
        if any(pkgutil.iter_modules(jax_plugins.__path__)):
            return True
    except Exception:
        pass
    try:
        from importlib.metadata import entry_points
        return bool(tuple(entry_points(group="jax_plugins")))
    except Exception:
        return False


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
        # An UNSET platform counts as CPU unless a PJRT accelerator plugin
        # is discoverable (then jax's default backend is the accelerator).
        plats = (jax.config.jax_platforms or "").strip()
        if not plats and not _accelerator_plugin_present():
            plats = "cpu"
        if plats == "cpu" \
                and os.environ.get("RECONFIGISP_CACHE_CPU") != "1":
            return None
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:  # flag drift across jax versions
        return None
    return path
