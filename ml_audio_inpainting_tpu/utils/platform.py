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

    # Persistent compilation cache for CPU runs (tests, classical benchmarks).
    # Deliberately NOT enabled for the experimental axon TPU backend -- cache
    # serialization support there is unverified and a hang would be worse
    # than a recompile.  Opt in explicitly with MAI_JAX_CACHE=<dir>.
    cache_dir = os.environ.get("MAI_JAX_CACHE")
    if cache_dir is None and plat == "cpu":
        cache_dir = os.path.expanduser("~/.cache/mai_jax")
    if cache_dir:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass
