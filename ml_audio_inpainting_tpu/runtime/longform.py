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

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "chunk_signal",
    "overlap_add",
    "longform_inpaint",
    "make_centered_gap_fn",
    "longform_inpaint_centered",
]

# The chunk/scatter/OLA helpers are jitted with static geometry: on the
# tunneled axon platform every eager op is a ~30 ms round trip, and the
# round-4 TPU capture showed the long-form pass spending ~4x the model time
# in those dispatches.  One compiled program per (shape, geometry) pair.


@functools.partial(jax.jit, static_argnums=(1, 2))
def _chunk(audio: jnp.ndarray, window: int, hop: int) -> jnp.ndarray:
    t = audio.shape[-1]
    n = max(1, -(-(max(t - window, 0)) // hop) + 1)
    padded = (n - 1) * hop + window
    x = jnp.pad(audio, (0, padded - t))
    idx = np.arange(n)[:, None] * hop + np.arange(window)[None, :]
    return x[idx]


def chunk_signal(
    audio: jnp.ndarray, window: int, hop: int
) -> Tuple[jnp.ndarray, int]:
    """Slice ``(T,)`` into ``(n_windows, window)`` with the given hop;
    zero-pads the tail.  Returns ``(windows, padded_len)``."""
    t = int(audio.shape[-1])
    n = max(1, -(-(max(t - window, 0)) // hop) + 1)
    return _chunk(audio, window, hop), (n - 1) * hop + window


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_pad(windows: jnp.ndarray, sel: jnp.ndarray, npad: int):
    bw = windows[sel]
    if npad > 0:
        bw = jnp.concatenate(
            [bw, jnp.zeros((npad, windows.shape[-1]), bw.dtype)]
        )
    return bw


@jax.jit
def _scatter(windows: jnp.ndarray, sel: jnp.ndarray, restored: jnp.ndarray):
    # restored may carry pad rows (fixed-shape serving); keep the first
    # len(sel) rows -- static shapes, so the slice fuses into the scatter.
    return windows.at[sel].set(restored[: sel.shape[0]])


def _ola_impl(windows: jnp.ndarray, hop: int, length: int) -> jnp.ndarray:
    n, w = windows.shape
    win = jnp.asarray(np.hanning(w) + 1e-3)  # strictly positive weights
    total = (n - 1) * hop + w
    idx = np.arange(n)[:, None] * hop + np.arange(w)[None, :]
    num = jnp.zeros((total,)).at[idx.reshape(-1)].add((windows * win).reshape(-1))
    den = jnp.zeros((total,)).at[idx.reshape(-1)].add(jnp.tile(win, n))
    return (num / den)[:length]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _ola(windows: jnp.ndarray, hop: int, length: int) -> jnp.ndarray:
    return _ola_impl(windows, hop, length)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _finalize_patches(
    windows, sel, restored, audio, gap_starts, gap_lens, hop, length, patch_window
):
    """Fused long-form epilogue, ONE compiled program: fold the final model
    batch into the window stack, Hann-OLA, time-composite against the
    original signal (exact outside the gaps -- the compositing contract of
    SURVEY.md §2.7 extended to long-form), then slice one PCM16 patch per
    gap.  Replaces the separate scatter + OLA dispatches AND shrinks the
    fetch from the full waveform (f32, e.g. 3.84 MB at 60 s) to
    ``n_gaps * patch_window`` int16 bytes -- the long-form analogue of
    ``runtime/transport.py``."""
    from ml_audio_inpainting_tpu.ops import gaps as gap_ops
    from ml_audio_inpainting_tpu.ops.pcm import to_pcm16

    w = windows
    if sel.shape[0] > 0:  # static shape: python-level branch is fine
        w = w.at[sel].set(restored[: sel.shape[0]])
    ola = _ola_impl(w, hop, length)
    masks = jax.vmap(
        lambda s, l: gap_ops.gap_mask(length, s, l, dtype=audio.dtype)
    )(gap_starts, gap_lens)
    valid = jnp.min(masks, axis=0)
    out = audio[:length] * valid + ola * (1.0 - valid)
    starts = jnp.clip(gap_starts, 0, length - patch_window).astype(jnp.int32)
    patches = jax.vmap(
        lambda s: jax.lax.dynamic_slice(out, (s,), (patch_window,))
    )(starts)
    return to_pcm16(patches), starts


def overlap_add(
    windows: jnp.ndarray, hop: int, length: int
) -> jnp.ndarray:
    """Hann-weighted OLA of ``(n, window)`` back to ``(length,)``."""
    return _ola(windows, int(hop), int(length))


def make_centered_gap_fn(
    inpaint_fn: Callable, window: int, batch: int, patch_window: int = 2048
) -> Callable:
    """ONE compiled program for long-form gap serving: slice a gap-centered
    ``window`` per gap out of the long waveform, inpaint the batch,
    composite (exact outside the gaps), and extract PCM16 patches -- fused
    window gather + model + epilogue, a single dispatch and a
    ``batch * patch_window`` int16 fetch.

    This supersedes the OLA path for well-separated gaps: the round-5
    composite means only the gap interiors ever come from the model, so
    blending two half-overlapping windows per gap (the OLA grid) does
    double the model work for bytes that are discarded -- one CENTERED
    window per gap both halves the compute and gives each gap the best
    context placement (mid-window, like the 5 s serving path).  Measured
    decomposition that motivated it: results/longform_decomposition.json
    (the chunk/gather/scatter/OLA stages are ~1 dispatch RTT each on the
    tunneled link).

    Returns ``fn(variables, audio (T,), gap_start (batch,), gap_len
    (batch,)) -> (patches (batch, patch_window) int16, starts (batch,)
    int32)`` with ``starts`` in LONG-signal coordinates.  Pad unused batch
    slots with zero-length gaps.  Contract: each gap's centered window
    must contain no other gap (use :func:`longform_inpaint_centered`,
    which validates spacing and falls back-friendly raises otherwise).
    """

    @jax.jit
    def fn(variables, audio: jnp.ndarray, gap_start: jnp.ndarray, gap_len: jnp.ndarray):
        from ml_audio_inpainting_tpu.ops import gaps as gap_ops
        from ml_audio_inpainting_tpu.ops.pcm import to_pcm16

        t = audio.shape[-1]
        if window > t:
            raise ValueError(f"window {window} exceeds signal length {t}")
        center = gap_start + gap_len // 2
        wstart = jnp.clip(center - window // 2, 0, t - window).astype(jnp.int32)
        wins = jax.vmap(
            lambda s: jax.lax.dynamic_slice(audio, (s,), (window,))
        )(wstart)
        local_gs = (gap_start - wstart).astype(jnp.int32)
        restored, _ = inpaint_fn(variables, wins, local_gs, gap_len)
        masks = jax.vmap(
            lambda s, l: gap_ops.gap_mask(window, s, l, dtype=audio.dtype)
        )(local_gs, gap_len)
        composited = wins * masks + restored * (1.0 - masks)
        pstart = jnp.clip(local_gs, 0, window - patch_window)
        patches = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (patch_window,))
        )(composited, pstart)
        return to_pcm16(patches), (wstart + pstart).astype(jnp.int32)

    return fn


def longform_inpaint_centered(
    inpaint_fn: Callable,
    variables,
    audio: jnp.ndarray,
    gap_start,
    gap_len,
    window: int = 80000,
    batch_size: int = 8,
    patch_window: int = 2048,
    _fn_cache: dict = {},
):
    """Drive :func:`make_centered_gap_fn` over arbitrarily many gaps.

    Validates the spacing contract (each gap's centered window contains no
    other gap -- raises ``ValueError`` otherwise; use
    :func:`longform_inpaint` for pathological clusters), pads each group
    of ``batch_size`` gaps with zero-length dummies so every call hits the
    same compiled ``(batch_size, window)`` program, and returns
    ``(patches (n_gaps, patch_window) int16, starts (n_gaps,) int32)``.
    Recombine with ``transport.composite_gap_patches_1d``.
    """
    gs = np.atleast_1d(np.asarray(gap_start, np.int64))
    gl = np.atleast_1d(np.asarray(gap_len, np.int64))
    t = int(audio.shape[-1])
    order = np.argsort(gs)
    s_sorted, l_sorted = gs[order], gl[order]
    for i in range(len(s_sorted) - 1):
        if s_sorted[i + 1] - (s_sorted[i] + l_sorted[i]) < window:
            raise ValueError(
                "centered long-form path requires gap spacing >= window "
                f"({window} samples); gaps at {int(s_sorted[i])} and "
                f"{int(s_sorted[i + 1])} are closer -- use longform_inpaint"
            )
    key = (id(inpaint_fn), window, batch_size, patch_window)
    fn = _fn_cache.get(key)
    if fn is None:
        fn = make_centered_gap_fn(
            inpaint_fn, window, batch_size, patch_window=patch_window
        )
        _fn_cache[key] = fn
    patches, starts = [], []
    for i in range(0, len(gs), batch_size):
        bs = np.zeros(batch_size, np.int64)
        bl = np.zeros(batch_size, np.int64)
        n = len(gs[i : i + batch_size])
        bs[:n], bl[:n] = gs[i : i + n], gl[i : i + n]
        p, s = fn(
            variables, audio, jnp.asarray(bs, jnp.int32), jnp.asarray(bl, jnp.int32)
        )
        patches.append(np.asarray(p)[:n])
        starts.append(np.asarray(s)[:n])
    return np.concatenate(patches), np.concatenate(starts)


def longform_inpaint(
    inpaint_fn: Callable,
    variables,
    audio: jnp.ndarray,
    gap_start,
    gap_len,
    window: int = 80000,
    hop: int = 40000,
    batch_size: int = 16,
    pad_batches: bool = False,
    gap_fetch: int | None = None,
) -> jnp.ndarray:
    """Inpaint one or more gaps in audio of any length with a fixed-window
    model.

    ``inpaint_fn``: a jitted ``fn(variables, audio(B, window), gap_start(B,),
    gap_len(B,)) -> (restored, aux)`` from ``runtime/inference.py``.  Windows
    that do not intersect a gap pass through (identity), so only the windows
    covering gaps run the model; output length == input length.

    ``gap_start``/``gap_len`` accept a scalar (single gap) or equal-length
    sequences (multiple gaps, the reference's MATLAB segmenter condition,
    ``segmentation_inp.m:89-148``).  A window intersecting several gaps is
    restored in sequential rounds (each round's model input carries the
    previous rounds' restorations, so nothing is overwritten).

    ``pad_batches=True`` pads every model call to exactly ``batch_size``
    windows (zero-length gaps on the pads) so the whole long-form pass hits
    ONE compiled ``(batch_size, window)`` program -- set ``batch_size`` to a
    shape you have already compiled (e.g. the serving batch) for
    compile-free long-form serving.

    ``gap_fetch``: when set (a patch window in samples, >= the largest
    gap), the return value becomes ``(patches, starts)`` -- one
    ``(n_gaps, gap_fetch)`` int16 PCM patch per gap plus its offset,
    produced by a single fused epilogue program (final scatter + OLA +
    time-composite + slice + quantize, ``_finalize_patches``).  The
    composite makes the delivered signal EXACTLY the input outside the
    gaps, so these patches are the only bytes a client needs
    (``runtime/transport.py`` semantics; recombine with
    ``transport.composite_gap_patches_1d``).
    """
    gap_starts = np.atleast_1d(np.asarray(gap_start, dtype=np.int64))
    gap_lens = np.atleast_1d(np.asarray(gap_len, dtype=np.int64))
    t = int(audio.shape[-1])
    windows, padded = chunk_signal(audio, window, hop)
    n = windows.shape[0]
    starts = np.arange(n) * hop

    # One (window, local gap) work item per window-gap intersection.
    items = []
    for g0, gl in zip(gap_starts.tolist(), gap_lens.tolist()):
        if gl <= 0:
            continue
        g1 = g0 + gl
        for w in np.nonzero((starts < g1) & (starts + window > g0))[0]:
            items.append(
                (int(w), int(max(g0 - starts[w], 0)), int(min(g1 - starts[w], window)))
            )

    # Rounds: each window at most once per round; later rounds read the
    # updated windows so multi-gap windows accumulate restorations.
    rounds = []
    for it in items:
        for r in rounds:
            if all(o[0] != it[0] for o in r):
                r.append(it)
                break
        else:
            rounds.append([it])

    out_windows = windows
    pending = None  # last (sel, restored): folded into the fused epilogue
    for r in rounds:
        for i in range(0, len(r), batch_size):
            chunk = r[i : i + batch_size]
            sel = np.asarray([c[0] for c in chunk])
            ls = np.asarray([c[1] for c in chunk], np.int64)
            le = np.asarray([c[2] for c in chunk], np.int64)
            npad = batch_size - len(chunk) if pad_batches else 0
            if npad > 0:
                ls = np.concatenate([ls, np.zeros(npad, np.int64)])
                le = np.concatenate([le, np.zeros(npad, np.int64)])
            if pending is not None:  # flush the previous call's scatter
                out_windows = _scatter(out_windows, pending[0], pending[1])
            bw = _gather_pad(out_windows, jnp.asarray(sel, jnp.int32), npad)
            restored, _ = inpaint_fn(
                variables,
                bw,
                jnp.asarray(ls, jnp.int32),
                jnp.asarray(np.maximum(le - ls, 0), jnp.int32),
            )
            pending = (jnp.asarray(sel, jnp.int32), restored)

    if gap_fetch is not None:
        sel_p, restored_p = pending if pending is not None else (
            jnp.zeros((0,), jnp.int32), jnp.zeros((0, window), audio.dtype)
        )
        return _finalize_patches(
            out_windows, sel_p, restored_p, audio,
            jnp.asarray(gap_starts, jnp.int32), jnp.asarray(gap_lens, jnp.int32),
            hop, t, gap_fetch,
        )

    if pending is not None:
        out_windows = _scatter(out_windows, pending[0], pending[1])
    return overlap_add(out_windows, hop, t)
