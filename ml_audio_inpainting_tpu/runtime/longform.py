"""Long-form audio inpainting: windowed batching over arbitrary durations.

The reference is hard-limited to 5 s clips (everything truncates to
``max_len`` samples, ``utils.py:39-48``); its only long-signal mechanism is
the MATLAB OLA segmenter for the classical solvers.  This module is the
neural-model counterpart and this domain's sequence parallelism
(SURVEY.md §5.7): a long waveform is cut into overlapping model-native
windows, the windows are stacked into one batch (so a 10-minute file is a
single batched forward -- and shards over the ``data`` mesh axis like any
batch), and the outputs are recombined by Hann-weighted overlap-add.

Gaps may appear anywhere; each window receives the portion of the global
gap mask it covers.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["chunk_signal", "overlap_add", "longform_inpaint"]


def chunk_signal(
    audio: jnp.ndarray, window: int, hop: int
) -> Tuple[jnp.ndarray, int]:
    """Slice ``(T,)`` into ``(n_windows, window)`` with the given hop;
    zero-pads the tail.  Returns ``(windows, padded_len)``."""
    t = audio.shape[-1]
    n = max(1, -(-(max(t - window, 0)) // hop) + 1)
    padded = (n - 1) * hop + window
    x = jnp.pad(audio, (0, padded - t))
    idx = np.arange(n)[:, None] * hop + np.arange(window)[None, :]
    return x[idx], padded


def overlap_add(
    windows: jnp.ndarray, hop: int, length: int
) -> jnp.ndarray:
    """Hann-weighted OLA of ``(n, window)`` back to ``(length,)``."""
    n, w = windows.shape
    win = jnp.asarray(np.hanning(w) + 1e-3)  # strictly positive weights
    total = (n - 1) * hop + w
    idx = np.arange(n)[:, None] * hop + np.arange(w)[None, :]
    num = jnp.zeros((total,)).at[idx.reshape(-1)].add((windows * win).reshape(-1))
    den = jnp.zeros((total,)).at[idx.reshape(-1)].add(jnp.tile(win, n))
    return (num / den)[:length]


def longform_inpaint(
    inpaint_fn: Callable,
    variables,
    audio: jnp.ndarray,
    gap_start: int,
    gap_len: int,
    window: int = 80000,
    hop: int = 40000,
    batch_size: int = 16,
) -> jnp.ndarray:
    """Inpaint a gap in audio of any length with a fixed-window model.

    ``inpaint_fn``: a jitted ``fn(variables, audio(B, window), gap_start(B,),
    gap_len(B,)) -> (restored, aux)`` from ``runtime/inference.py``.  Windows
    that do not intersect the gap pass through (identity), so only the
    windows covering the gap run the model; output length == input length.
    """
    t = int(audio.shape[-1])
    windows, padded = chunk_signal(audio, window, hop)
    n = windows.shape[0]
    starts = np.arange(n) * hop

    # Which windows intersect the gap?
    g0, g1 = int(gap_start), int(gap_start + gap_len)
    hit = (starts < g1) & (starts + window > g0)
    hit_idx = np.nonzero(hit)[0]

    out_windows = windows
    for i in range(0, len(hit_idx), batch_size):
        sel = hit_idx[i : i + batch_size]
        local_start = jnp.asarray(np.maximum(g0 - starts[sel], 0), jnp.int32)
        local_end = jnp.asarray(np.minimum(g1 - starts[sel], window), jnp.int32)
        restored, _ = inpaint_fn(
            variables,
            windows[sel],
            local_start,
            jnp.maximum(local_end - local_start, 0),
        )
        out_windows = out_windows.at[sel].set(restored)

    return overlap_add(out_windows, hop, t)
