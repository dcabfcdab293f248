"""Profiling and step timing.

The reference's only timing is MATLAB tic/toc columns and tqdm postfixes
(SURVEY.md §5.1).  This exposes the real thing: the ``jax.profiler`` trace
server (view in TensorBoard's profile plugin / Perfetto) plus a lightweight
step timer that accounts for async dispatch by materializing a probe output.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np

__all__ = ["start_server", "trace", "StepTimer"]


def start_server(port: int = 9999):
    """Start the profiler server; connect TensorBoard's profile tab to it."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str, with_perfetto: bool = False):
    """Capture a profiler trace of the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup discard and percentiles.

    Usage::

        timer = StepTimer(warmup=2)
        for batch in feed:
            with timer:
                state, metrics = step(state, batch, key)
                timer.probe(metrics["loss"])  # forces execution
        print(timer.summary())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def probe(self, value) -> None:
        """Materialize a value so the step's device work is included."""
        np.asarray(value)

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> dict:
        ts = np.asarray(self.times[self.warmup :])
        if len(ts) == 0:
            return {}
        return {
            "steps": int(len(ts)),
            "mean_ms": float(ts.mean() * 1e3),
            "p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
            "steps_per_s": float(1.0 / ts.mean()),
        }
