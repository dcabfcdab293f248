"""Gap engine: PRNG-driven binary gap masks as batched device ops.

Reference capability: ``create_gap_mask`` / ``add_random_gap``
(``utils.py:93-188``) -- host NumPy, one mask at a time, ``np.random`` global
state.  Here mask generation is a pure function of a ``jax.random`` key with
static shapes, so sampling B masks (or the CNNBLSTM recipe of 25 gap variants
per clip, ``models/CNNBLSTM/dataset.py:89-119``) is a single fused XLA op via
``vmap`` -- the clip is loaded and STFT'd once, only the cheap mask varies.

Mask convention (canonical, SURVEY.md §2.7): ``1.0 = valid signal,
0.0 = gap``.  Adapters for the CNNBLSTM inverted convention live in
``ops/masking.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "gap_mask",
    "random_gap_mask",
    "apply_gap",
    "frame_mask_from_interval",
    "frame_mask_from_sample_mask",
]


@functools.partial(jax.jit, static_argnames=("audio_len", "dtype"))
def gap_mask(
    audio_len: int,
    gap_start: jnp.ndarray,
    gap_len: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Binary mask of shape ``(audio_len,)`` with zeros on [start, start+len).

    ``gap_start``/``gap_len`` are sample-count arrays (traced values are fine),
    so this is vmappable over a batch of gap positions.
    """
    idx = jnp.arange(audio_len)
    inside = (idx >= gap_start) & (idx < gap_start + gap_len)
    return jnp.where(inside, jnp.zeros((), dtype), jnp.ones((), dtype))


def random_gap_mask(
    key: jax.Array,
    audio_len: int,
    gap_len_s: float,
    sample_rate: int = 16000,
    gap_start_s: Optional[float] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Sample a single-gap mask; returns ``(mask, (start, end))`` in samples.

    Matches the semantics of the reference's ``create_gap_mask``
    (``utils.py:93-144``): gap length ``int(gap_len_s * sample_rate)``,
    uniform random start over ``[0, audio_len - gap_len]`` inclusive (or the
    fixed ``gap_start_s`` when given), mask 1.0 = signal / 0.0 = gap.
    """
    gap_len = int(gap_len_s * sample_rate)
    if gap_len <= 0:
        z = jnp.zeros((), jnp.int32)
        return jnp.ones((audio_len,), dtype), (z, z)
    if gap_len >= audio_len:
        return jnp.zeros((audio_len,), dtype), (
            jnp.zeros((), jnp.int32),
            jnp.full((), audio_len, jnp.int32),
        )

    if gap_start_s is None:
        start = jax.random.randint(key, (), 0, audio_len - gap_len + 1)
    else:
        start = jnp.full((), int(gap_start_s * sample_rate), jnp.int32)
    end = start + gap_len
    return gap_mask(audio_len, start, gap_len, dtype=dtype), (start, end)


def apply_gap(audio: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero the gap region: the corruption model of the whole framework
    (reference: ``impaired_audio = original * mask``, ``dataset.py:109``)."""
    return audio * mask


def frame_mask_from_interval(
    gap_start: jnp.ndarray,
    gap_end: jnp.ndarray,
    n_freq: int,
    n_time: int,
    hop_length: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Spectrogram-domain mask ``(n_freq, n_time)`` from a sample interval.

    Frame coverage matches the reference's floor/ceil rule
    (``models/GAN/dataset.py:138-152``): frames ``[start // hop,
    ceil(end / hop))`` are marked as hole (0.0), everything else valid (1.0).
    """
    start_f = gap_start // hop_length
    end_f = -(-gap_end // hop_length)  # ceil division on traced ints
    t = jnp.arange(n_time)
    hole = (t >= start_f) & (t < end_f) & (gap_end > gap_start)
    col = jnp.where(hole, jnp.zeros((), dtype), jnp.ones((), dtype))
    return jnp.broadcast_to(col[None, :], (n_freq, n_time))


def frame_mask_from_sample_mask(
    sample_mask: jnp.ndarray,
    n_freq: int,
    n_time: int,
    hop_length: int,
    rule: str = "any",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Frame mask ``(..., n_freq, n_time)`` from an arbitrary 1=valid
    sample mask ``(..., n_samples)`` -- the multi-gap generalization of
    :func:`frame_mask_from_interval`.

    ``rule="any"``: frame ``t`` is a hole iff any sample in
    ``[t*hop, (t+1)*hop)`` is missing.  For a single interval ``[s, e)``
    this reduces EXACTLY to the GAN floor/ceil rule (frames
    ``[s // hop, ceil(e / hop))``).

    ``rule="end"``: frame ``t`` is a hole iff sample ``t*hop + hop - 1``
    is missing -- exactly the CNNBLSTM floor/floor rule (frames
    ``[s // hop, e // hop)``).

    Returns 1 = valid / 0 = hole (flip for the CNNBLSTM 1=gap convention
    at the call site).
    """
    n = sample_mask.shape[-1]
    miss = 1.0 - sample_mask
    total = n_time * hop_length
    if total > n:
        widths = [(0, 0)] * (miss.ndim - 1) + [(0, total - n)]
        miss = jnp.pad(miss, widths)
    else:
        miss = miss[..., :total]
    windows = miss.reshape(miss.shape[:-1] + (n_time, hop_length))
    hole = windows.max(axis=-1) if rule == "any" else windows[..., -1]
    col = jnp.where(hole > 0, jnp.zeros((), dtype), jnp.ones((), dtype))
    return jnp.broadcast_to(col[..., None, :], col.shape[:-1] + (n_freq, n_time))
