"""Sharding rules and mesh-parallel train-step builders.

Layout policy (SURVEY.md §2.6):

* **DP**: the waveform batch is sharded over the ``data`` axis; parameters
  are replicated across it, so pjit emits gradient ``psum`` over ICI.
* **TP**: the only weight matrices worth sharding at this model scale are
  the BiLSTM input projections (16448 x 4H, ``ops/lstm.py``) and the output
  projection (256 -> 257*16); those shard over the ``model`` axis on their
  large dimension.  Everything else is replicated (PP/EP are n/a for these
  model families -- SURVEY.md §2.6 rows).

The rules are name/shape-based over the param pytree, so they apply to any
of the model families without per-model annotations.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ml_audio_inpainting_tpu.parallel.mesh import batch_sharding, replicated

__all__ = ["param_sharding_rules", "state_shardings", "make_sharded_step"]

# Minimum size of a dimension before tensor-sharding it pays for the
# collectives it induces.
_TP_MIN_DIM = 1024


def param_sharding_rules(mesh: Mesh) -> Callable[[Tuple, Any], NamedSharding]:
    """Returns ``rule(path, leaf) -> NamedSharding`` for one parameter."""
    model_size = mesh.shape["model"]

    def rule(path: Tuple, leaf) -> NamedSharding:
        if model_size == 1 or not hasattr(leaf, "shape") or leaf.ndim < 2:
            return replicated(mesh)
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        # BiLSTM input projection: shard the wide input dim.
        if "w_ih" in name and leaf.shape[0] >= _TP_MIN_DIM and leaf.shape[0] % model_size == 0:
            return NamedSharding(mesh, P("model", None))
        # Dense projections: shard the wide output dim.
        if (
            "projection" in name
            and leaf.shape[-1] >= _TP_MIN_DIM
            and leaf.shape[-1] % model_size == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return replicated(mesh)

    return rule


def state_shardings(state: Any, mesh: Mesh):
    """Build a sharding pytree matching a train state: params (and their
    optimizer moments) follow :func:`param_sharding_rules`; everything else
    is replicated."""
    rule = param_sharding_rules(mesh)

    def annotate_tree(tree):
        return jax.tree_util.tree_map_with_path(lambda p, l: rule(p, l), tree)

    def annotate(path, leaf):
        return rule(path, leaf)

    # Shard params and any optimizer slots that mirror the params' treedef.
    flat = jax.tree_util.tree_map_with_path(annotate, state)
    return flat


def make_sharded_step(step_fn: Callable, state_template: Any, mesh: Mesh) -> Callable:
    """Wrap a ``step(state, audio, key) -> (state, metrics)`` in pjit with
    explicit shardings: state per :func:`state_shardings`, audio sharded on
    the batch axis, key and metrics replicated."""
    st_shard = state_shardings(state_template, mesh)
    return jax.jit(
        step_fn,
        in_shardings=(st_shard, batch_sharding(mesh), replicated(mesh)),
        out_shardings=(st_shard, replicated(mesh)),
    )


def place_state(state: Any, mesh: Mesh):
    """Device-put a host train state against its mesh sharding."""
    return jax.device_put(state, state_shardings(state, mesh))
