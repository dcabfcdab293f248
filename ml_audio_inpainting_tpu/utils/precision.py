"""Mixed-precision helpers shared by the train and serve paths.

One cast predicate everywhere: float leaves follow the requested compute
dtype, integer/PRNG leaves pass through. Train (gan_trainer) and serve
(runtime/inference) previously each had their own inline variant with
subtly different predicates (f32-only vs any-float) — identical in
practice because checkpoints widen to f32 at load, but one definition
keeps them from diverging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cast_floating"]


def cast_floating(tree, dtype):
    """Cast every floating leaf of ``tree`` to ``dtype`` (others pass)."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype)
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        tree,
    )
