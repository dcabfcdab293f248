"""Platform selection helper.

Some environments auto-register an accelerator PJRT plugin from
``sitecustomize`` in a way that overrides ``JAX_PLATFORMS`` (observed with
the axon TPU plugin).  Calling :func:`apply_platform_env` early in every CLI
entry point re-asserts the user's requested platform via ``jax.config`` so
``JAX_PLATFORMS=cpu mai-...`` behaves as documented.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_env"]


def apply_platform_env() -> None:
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; env took effect or cannot change

    # Persistent compilation cache: verified working on both CPU and the
    # axon TPU backend (a cold bench compile drops from ~20 min through the
    # remote-compile tunnel to ~seconds on a cache hit).  Override the
    # location with MAI_JAX_CACHE.
    cache_dir = os.environ.get("MAI_JAX_CACHE", os.path.expanduser("~/.cache/mai_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
