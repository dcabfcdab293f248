"""Host -> device input pipeline: worker-pool decode + prefetch.

Replaces the reference's ``DataLoader(num_workers=4, pin_memory,
persistent_workers)`` (``models/GAN/train.py:194-199``) with a TPU-shaped
design (SURVEY.md §2.6 "Host data-loading parallelism"):

* ``batch_iterator(workers=N)`` decodes items on a bounded-window thread
  pool -- the native codec's ctypes calls release the GIL, so FLAC/MP3
  decodes genuinely run in parallel -- while keeping deterministic batch
  order;
* ``prefetch_to_device`` assembles the *next* batches while the device
  runs the current step, ``jax.device_put`` against the target sharding
  ahead of time, so each training step finds its input already resident
  (and already laid out across the mesh for data-parallel runs).
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
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
    workers: int = 0,
) -> Iterator[np.ndarray]:
    """Yield ``(B, max_samples)`` float32 waveform batches from a dataset.

    ``workers > 0`` decodes items through a thread pool with a bounded
    in-flight window (``2 * workers * batch_size`` items), preserving the
    exact serial batch order -- the reference's ``num_workers=4`` decode
    parallelism without its worker-process shuffle nondeterminism.
    """
    executor = ThreadPoolExecutor(max_workers=workers) if workers > 0 else None
    try:
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(dataset))
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            limit = (
                len(order) - len(order) % batch_size if drop_last else len(order)
            )
            idxs = iter(int(j) for j in order[:limit])

            if executor is None:
                batch: list = []
                for j in idxs:
                    batch.append(dataset[j])
                    if len(batch) == batch_size:
                        yield np.stack(batch)
                        batch = []
                if batch:
                    yield np.stack(batch)
            else:
                window = 2 * workers * batch_size
                pending: deque = deque()

                def fill():
                    while len(pending) < window:
                        try:
                            j = next(idxs)
                        except StopIteration:
                            return
                        pending.append(executor.submit(dataset.__getitem__, j))

                fill()
                batch = []
                while pending:
                    batch.append(pending.popleft().result())
                    fill()
                    if len(batch) == batch_size:
                        yield np.stack(batch)
                        batch = []
                if batch:
                    yield np.stack(batch)
            epoch += 1
    finally:
        if executor is not None:
            executor.shutdown(wait=False, cancel_futures=True)


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
