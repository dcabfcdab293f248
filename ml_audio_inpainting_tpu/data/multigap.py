"""Multi-gap corruption: several gaps per clip with spacing constraints.

Reference: ``models/AudioReg/irmas/IRMAS_gaps.m`` -- 10 gaps per file with
lengths 10-80 ms, minimum distance between gaps, cos^2 fade-in/fade-out at
the gap edges, exported as a table of masks/intervals.  Also covers the
eval-table builder ``create_librispeech_dataset.m`` (one fixed gap per
clip -> mask table).

Here gap placement is rejection-free: the K gap lengths are sampled first,
then starts are drawn by distributing the leftover free space between gaps
uniformly (a stick-breaking scheme), which guarantees the min-distance
constraint by construction -- no MATLAB-style retry loops, fully vmappable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["multi_gap_mask", "cos2_fade", "apply_gaps_with_fades", "eval_gap_table"]


@functools.partial(
    jax.jit,
    static_argnames=("audio_len", "n_gaps", "sample_rate", "min_dist_samples"),
)
def multi_gap_mask(
    key: jax.Array,
    audio_len: int,
    n_gaps: int,
    min_gap_ms: float = 10.0,
    max_gap_ms: float = 80.0,
    sample_rate: int = 16000,
    min_dist_samples: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample ``n_gaps`` non-overlapping gaps with minimum spacing.

    Returns ``(mask, starts, lengths)`` -- mask 1 = signal / 0 = gap, and
    per-gap start/length arrays of shape ``(n_gaps,)``.

    Construction guarantees: gaps ordered, pairwise separated by at least
    ``min_dist_samples``, none touching the signal edges (IRMAS_gaps.m's
    validity checks), as long as the budget fits -- otherwise lengths are
    scaled down to fit.
    """
    k_len, k_pos = jax.random.split(key)
    min_len = jnp.asarray(min_gap_ms * sample_rate / 1000.0)
    max_len = jnp.asarray(max_gap_ms * sample_rate / 1000.0)
    lengths = jax.random.uniform(
        k_len, (n_gaps,), minval=min_len, maxval=max_len
    ).astype(jnp.int32)

    total_gap = jnp.sum(lengths)
    # Free space to distribute among n_gaps+1 slots (before, between, after),
    # with min_dist enforced between gaps and at the edges.
    reserved = (n_gaps + 1) * min_dist_samples
    free = audio_len - total_gap - reserved
    # If the budget doesn't fit, shrink lengths proportionally.
    scale = jnp.where(free < 0, (audio_len - reserved) / jnp.maximum(total_gap, 1), 1.0)
    lengths = jnp.maximum((lengths * jnp.clip(scale, 0.05, 1.0)).astype(jnp.int32), 16)
    total_gap = jnp.sum(lengths)
    free = jnp.maximum(audio_len - total_gap - reserved, 0)

    # Stick-breaking: uniform simplex over n_gaps+1 slots via sorted uniforms.
    u = jnp.sort(jax.random.uniform(k_pos, (n_gaps,)))
    bounds = jnp.concatenate([jnp.zeros(1), u, jnp.ones(1)])
    slots = (jnp.diff(bounds) * free).astype(jnp.int32)  # (n_gaps+1,)

    gap_offsets = jnp.cumsum(lengths) - lengths  # prefix sums of gap lengths
    spacing = jnp.cumsum(slots[:-1]) + min_dist_samples * (jnp.arange(n_gaps) + 1)
    starts = spacing + gap_offsets

    idx = jnp.arange(audio_len)
    in_any = jnp.zeros((audio_len,), bool)
    for g in range(n_gaps):  # static unroll, n_gaps is small
        in_any = in_any | ((idx >= starts[g]) & (idx < starts[g] + lengths[g]))
    mask = jnp.where(in_any, 0.0, 1.0)
    return mask, starts, lengths


def cos2_fade(fade_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """cos^2 ramp from 1 to 0 over ``fade_len`` samples (IRMAS_gaps.m fades)."""
    t = jnp.linspace(0.0, jnp.pi / 2, fade_len, dtype=dtype)
    return jnp.cos(t) ** 2


@functools.partial(jax.jit, static_argnames=("fade_len",))
def apply_gaps_with_fades(
    audio: jnp.ndarray,
    starts: jnp.ndarray,
    lengths: jnp.ndarray,
    fade_len: int = 32,
) -> jnp.ndarray:
    """Zero the gaps with cos^2 fade-out/fade-in at the edges.

    The IRMAS builder smooths gap boundaries so the corruption has no
    clicks (``IRMAS_gaps.m`` cos^2 fades); the fade region sits just
    outside each gap.
    """
    n = audio.shape[-1]
    idx = jnp.arange(n)
    gain = jnp.ones((n,), audio.dtype)
    n_gaps = starts.shape[0]
    for g in range(n_gaps):
        s, l = starts[g], lengths[g]
        # inside gap: 0
        gain = jnp.where((idx >= s) & (idx < s + l), 0.0, gain)
        # fade-out before
        pos = (s - idx).astype(audio.dtype)
        fo = jnp.cos((jnp.pi / 2) * (1.0 - pos / fade_len)) ** 2
        gain = jnp.where((idx >= s - fade_len) & (idx < s), jnp.minimum(gain, fo), gain)
        # fade-in after
        pos2 = (idx - (s + l)).astype(audio.dtype)
        fi = jnp.cos((jnp.pi / 2) * (1.0 - pos2 / fade_len)) ** 2
        gain = jnp.where(
            (idx >= s + l) & (idx < s + l + fade_len), jnp.minimum(gain, fi), gain
        )
    return audio * gain


def eval_gap_table(
    n_signals: int,
    audio_len: int = 80000,
    gap_len_samples: int = 1280,
    gap_start_samples: int = 32000,
):
    """The ``gaps_table_librispeech.mat`` equivalent: fixed-position masks
    for the standard eval condition (80 ms @ t=2 s,
    ``create_librispeech_dataset.m:18-20``).  Returns ``(masks, starts,
    lengths)`` stacked over signals."""
    import numpy as np

    mask = np.ones((n_signals, audio_len), np.float32)
    mask[:, gap_start_samples : gap_start_samples + gap_len_samples] = 0.0
    starts = np.full((n_signals,), gap_start_samples, np.int32)
    lengths = np.full((n_signals,), gap_len_samples, np.int32)
    return mask, starts, lengths
