"""Device mesh and sharding layout.

The reference is single-device (``cuda if available else cpu``,
``models/GAN/train.py:179``; SURVEY.md §2.6 records zero distributed code).
In this framework distribution is first-class: a ``jax.sharding.Mesh`` with
axes ``("data", "model")``; training shards the waveform batch over ``data``
(gradients are reduced by XLA collectives over ICI when pjit sees replicated
params + sharded batch), and the ``model`` axis is reserved for tensor
sharding of the BiLSTM/conv weights at larger scales.

Multi-host: call :func:`initialize_distributed` before mesh construction --
``jax.distributed`` + DCN handle cross-slice collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
]


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (no-op on a single process)."""
    if jax.process_count() > 1 or kwargs:
        jax.distributed.initialize(**kwargs)


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data_parallel = -1`` uses every device not claimed by ``model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1 or n % model_parallel != 0:
        raise ValueError(f"model_parallel={model_parallel} does not divide {n} devices")
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} available devices"
        )
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch against the data-parallel sharding."""
    return jax.device_put(batch, batch_sharding(mesh))
