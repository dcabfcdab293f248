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
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; env took effect or cannot change
