"""Gap-only PCM16 serving transport: fetch the reconstructed gap, not the clip.

The serving functions return the full restored waveform, but the compositing
contract (SURVEY.md §2.7; reference ``models/CNNBLSTM/model.py:107`` and
``utils.py:54-89`` -- prediction inside the gap, untouched input elsewhere)
means every sample outside the gap is bit-identical to the input the client
already holds.  At the 80 ms eval gap on 5 s clips that is ~98.4% of the
payload: a full-clip PCM16 fetch moves 160 KB/clip of which ~2.6 KB is new
information.  On this environment the host<->device link is the measured
serving bottleneck (results/README.md; BENCH_r04 canonical swung 342-942
s-audio/s with relay weather), so the full-clip fetch makes the headline
metric a *link* measurement.  Fetching only a fixed window around the gap
moves the bottleneck back to device compute.

Wire protocol (``make_gap_transport_fn``):

* device -> host: ``patch`` -- ``(B, window)`` int16, the PCM16 quantization
  of the restored waveform over ``[start, start + window)``; and ``start``
  -- ``(B,)`` int32, where each patch goes.  ``window`` is static (one
  compiled program per window size) and must cover the largest gap served;
  ``start = clip(gap_start, 0, n - window)`` so the patch always contains
  the whole gap interval.
* host side: :func:`composite_gap_patch` writes each patch into the
  client's own PCM16 copy of the input.  Because the wrapper re-applies the
  time-domain composite ON DEVICE before slicing (``audio*mask +
  restored*(1-mask)``, idempotent for the already-composited deployable
  regimes), the result equals a full-clip ``to_pcm16(restored)`` fetch
  EXACTLY, int16-for-int16 (pinned in ``tests/test_transport.py``).

The wrapper enforces the compositing contract regardless of the wrapped
regime, so wrapping a ``mode="parity"`` fn delivers the parity prediction
inside the gap and the input outside -- the enhanced-mode composite
semantics.  Production serving should wrap ``mode="enhanced"`` fns.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.ops import gaps as gap_ops
from ml_audio_inpainting_tpu.ops.pcm import to_pcm16

__all__ = [
    "make_gap_transport_fn",
    "composite_gap_patch",
    "composite_gap_patches_1d",
    "DEFAULT_PATCH_WINDOW",
]

# 2048 samples = 128 ms at 16 kHz: covers the reference's full evaluated
# short-gap range (40-120 ms) with margin; serving longer gaps picks a
# larger window (one extra compile), mirroring route_checkpoint's
# length-routing.  Power of two keeps the dynamic_slice layout-friendly.
DEFAULT_PATCH_WINDOW = 2048


def make_gap_transport_fn(
    inpaint_fn: Callable, window: int = DEFAULT_PATCH_WINDOW
) -> Callable:
    """Wrap a jitted ``fn(variables, audio, gap_start, gap_len) ->
    (restored, aux)`` serving function into the gap-only PCM16 transport.

    Returns ``fn(variables, audio, gap_start, gap_len) -> (patch, start)``
    with ``patch`` ``(B, window)`` int16 and ``start`` ``(B,)`` int32 --
    the only bytes that differ from the client's input under the
    compositing contract.  ``gap_len`` must be <= ``window`` for the patch
    to contain the whole reconstruction (checked at trace time against the
    static window when ``gap_len`` is concrete is impossible -- documented
    contract, like the reference's own max-gap assumptions,
    ``models/AudioReg/utils/arinpaint.m:1-20``).
    """

    @jax.jit
    def fn(variables, audio: jnp.ndarray, gap_start: jnp.ndarray, gap_len: jnp.ndarray):
        n = audio.shape[-1]
        if window > n:
            raise ValueError(f"patch window {window} exceeds clip length {n}")
        restored, _ = inpaint_fn(variables, audio, gap_start, gap_len)
        tmask = jax.vmap(
            lambda s, l: gap_ops.gap_mask(n, s, l, dtype=audio.dtype)
        )(gap_start, gap_len)
        # Enforce the compositing contract on device: output == input outside
        # the gap, bitwise (idempotent when the wrapped fn already
        # composited -- tmask is {0,1} so the algebra collapses exactly).
        composited = audio * tmask + restored * (1.0 - tmask)
        start = jnp.clip(gap_start, 0, n - window).astype(jnp.int32)
        patch = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (window,))
        )(composited, start)
        return to_pcm16(patch), start

    return fn


def composite_gap_patch(
    audio_pcm16: np.ndarray, patch: np.ndarray, start: np.ndarray
) -> np.ndarray:
    """Client-side composite: write each gap patch into the client's PCM16
    copy of its own input.

    ``audio_pcm16``: ``(B, S)`` int16 -- the client's input clips (the
    deliverable format; ``to_pcm16`` of the float input).  ``patch`` /
    ``start``: the wire payload from :func:`make_gap_transport_fn`.
    Returns the ``(B, S)`` int16 deliverable, equal to a full-clip
    ``to_pcm16(restored)`` fetch exactly.
    """
    out = np.array(audio_pcm16, copy=True)
    patch = np.asarray(patch)
    start = np.asarray(start)
    w = patch.shape[-1]
    for b in range(out.shape[0]):
        s = int(start[b])
        out[b, s : s + w] = patch[b]
    return out


def composite_gap_patches_1d(
    audio_pcm16: np.ndarray, patches: np.ndarray, starts: np.ndarray
) -> np.ndarray:
    """Client-side composite for the LONG-FORM gap transport: write each of
    ``n_gaps`` patches into a single PCM16 signal (the payload of
    ``runtime.longform.longform_inpaint(..., gap_fetch=...)``).

    Overlapping patch windows (nearby gaps) are consistent by construction
    -- every patch is a slice of the same composited device signal.
    """
    out = np.array(audio_pcm16, copy=True)
    for patch, s in zip(np.asarray(patches), np.asarray(starts)):
        s = int(s)
        out[s : s + patch.shape[-1]] = patch
    return out
