"""Host -> device input pipeline: threaded prefetch with double buffering.

Replaces the reference's ``DataLoader(num_workers=4, pin_memory,
persistent_workers)`` (``models/GAN/train.py:194-199``) with a TPU-shaped
design (SURVEY.md §2.6 "Host data-loading parallelism"):

* a thread pool decodes/assembles the *next* waveform batches while the
  device runs the current step (decode is cheap -- the heavy DSP moved onto
  the device);
* batches are ``jax.device_put`` against the target sharding ahead of time,
  so each training step finds its input already resident (and already laid
  out across the mesh for data-parallel runs).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

__all__ = ["batch_iterator", "prefetch_to_device"]


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield ``(B, max_samples)`` float32 waveform batches from a dataset."""
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            yield np.stack([dataset[int(j)] for j in idx])
        epoch += 1


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator:
    """Prefetch ``size`` batches onto the device(s) ahead of consumption.

    With a ``NamedSharding`` this also performs the host->device scatter for
    data-parallel meshes, so the train step's inputs arrive pre-sharded.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    error: list = []

    def producer():
        try:
            for batch in iterator:
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except BaseException as e:  # propagate to the consumer, don't swallow
            error.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
