"""TensorBoard event scraping and loss-curve comparison plots.

Reference: ``models/GAN/graph.py`` -- reads event files with
``EventAccumulator``, merges resumed runs by global step, EMA-smooths, and
plots run-vs-run comparisons (their 80 ms vs 200 ms gap experiment).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["smooth", "load_scalar_runs", "plot_runs"]


def smooth(values: np.ndarray, weight: float = 0.95) -> np.ndarray:
    """EMA smoothing, matching ``graph.py:6-14``."""
    out = np.empty_like(values, dtype=np.float64)
    last = values[0]
    for i, v in enumerate(values):
        last = last * weight + (1 - weight) * v
        out[i] = last
    return out


def load_scalar_runs(
    run_dirs: Sequence[Union[str, Path]], tag: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Load and merge a scalar tag from several (possibly resumed) run dirs,
    sorted and de-duplicated by global step (``graph.py:41-54``)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    steps: List[int] = []
    vals: List[float] = []
    for d in run_dirs:
        acc = EventAccumulator(str(d))
        acc.Reload()
        if tag not in acc.Tags().get("scalars", []):
            continue
        for ev in acc.Scalars(tag):
            steps.append(ev.step)
            vals.append(ev.value)
    order = np.argsort(steps, kind="stable")
    s = np.asarray(steps)[order]
    v = np.asarray(vals)[order]
    _, first = np.unique(s, return_index=True)
    return s[first], v[first]


def plot_runs(
    runs: Dict[str, Sequence[Union[str, Path]]],
    tag: str,
    smooth_weight: float = 0.95,
    title: Optional[str] = None,
    save_path: Optional[Union[str, Path]] = None,
):
    """Comparison plot of one scalar tag across named run groups."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for name, dirs in runs.items():
        steps, vals = load_scalar_runs(dirs, tag)
        if len(steps) == 0:
            continue
        ax.plot(steps, smooth(vals, smooth_weight), label=name)
    ax.set_xlabel("step")
    ax.set_ylabel(tag)
    ax.set_title(title or tag)
    ax.legend()
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path)
        plt.close(fig)
        return None
    return fig
