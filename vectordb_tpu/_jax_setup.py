"""Process-wide JAX configuration for the engine.

Compilation (especially remote/tunneled compilation) is a dominant cost for
short-lived processes, so a persistent compilation cache is enabled by
default. Override the location with VECTORDB_TPU_JAX_CACHE, or set it to
"off" to disable.
"""
from __future__ import annotations

import os

_configured = False


def configure_jax() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    cache = os.environ.get("VECTORDB_TPU_JAX_CACHE")
    if cache == "off":
        return
    if not cache:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "vectordb_tpu", "jax")
    try:
        os.makedirs(cache, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization; never fail startup
        pass
