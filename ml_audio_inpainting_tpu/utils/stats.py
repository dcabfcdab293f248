"""Statistics + interval plotting: bootstrap-t confidence intervals.

Reference: ``models/AudioReg/utils/bootstrap_est.m`` (bootstrap-t CI for
column means), ``fillinterval.m`` (shaded CI band plot), ``plotinterval.m``
(line + dashed-bound plot) -- the statistical layer behind the reference's
result figures (``plotting/*.m``).

The resampling loop is vectorized: all ``n_boot`` resamples are drawn and
reduced at once (one gather + mean per statistic) instead of MATLAB's
per-iteration loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["bootstrap_ci", "fill_interval", "plot_interval"]


def bootstrap_ci(
    data: np.ndarray,
    n_boot: int = 1000,
    alpha: float = 0.05,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bootstrap-t confidence interval for the mean along axis 0.

    ``data``: ``(n_samples, ...)``.  Returns ``(mean, lo, hi)`` each of
    shape ``data.shape[1:]`` -- the studentized bootstrap of
    ``bootstrap_est.m:1-72``.
    """
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[0]
    if n < 2:
        m = data.mean(axis=0)
        return m, m, m
    rng = np.random.default_rng(seed)

    mean = data.mean(axis=0)
    se = data.std(axis=0, ddof=1) / np.sqrt(n)
    se = np.where(se == 0, 1e-12, se)

    idx = rng.integers(0, n, size=(n_boot, n))
    resamples = data[idx]  # (n_boot, n, ...)
    bmean = resamples.mean(axis=1)
    bse = resamples.std(axis=1, ddof=1) / np.sqrt(n)
    bse = np.where(bse == 0, 1e-12, bse)
    t_stats = (bmean - mean) / bse  # (n_boot, ...)

    t_lo = np.quantile(t_stats, alpha / 2, axis=0)
    t_hi = np.quantile(t_stats, 1 - alpha / 2, axis=0)
    # bootstrap-t: CI = mean - t_{1-a/2} * se, mean - t_{a/2} * se
    lo = mean - t_hi * se
    hi = mean - t_lo * se
    return mean, lo, hi


def fill_interval(ax, x, mean, lo, hi, color=None, alpha: float = 0.25, label=None):
    """Shaded CI band + center line (``fillinterval.m:1-27``)."""
    (line,) = ax.plot(x, mean, color=color, label=label)
    ax.fill_between(x, lo, hi, color=line.get_color(), alpha=alpha, linewidth=0)
    return line


def plot_interval(ax, x, mean, lo, hi, color=None, label=None):
    """Center line with dashed CI bounds (``plotinterval.m:1-18``)."""
    (line,) = ax.plot(x, mean, color=color, label=label)
    c = line.get_color()
    ax.plot(x, lo, linestyle="--", color=c, linewidth=0.8)
    ax.plot(x, hi, linestyle="--", color=c, linewidth=0.8)
    return line
