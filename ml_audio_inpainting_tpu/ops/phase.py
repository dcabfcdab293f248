"""Deployable gap-phase estimation: phase-vocoder extrapolation.

Waveform-domain SDR punishes any phase misalignment inside an inpainted
gap.  The reference sidesteps the problem with either the ORIGINAL phase
(an oracle -- those samples are exactly what was lost, ``utils.py:316-333``)
or Griffin-Lim from scratch (``model_eval.py:130-143``), which converges to
a self-consistent but arbitrarily-aligned phase and scores poorly on SDR.

This module estimates the missing phase from information that survives the
gap: the per-bin instantaneous frequency measured at the gap boundaries.
Standard phase-vocoder identity: for an STFT with hop ``a`` and size
``n_fft``, a stationary partial near bin ``f`` advances its phase by

    adv[f] = omega[f] + princarg(dphi_measured[f] - omega[f]),
    omega[f] = 2*pi*f*a/n_fft

per hop.  We measure ``dphi`` at the last valid frame before the gap (and
the first valid frame after it), extrapolate linearly in time from both
sides, and blend the two predictions with a time crossfade on the complex
unit circle -- the same bidirectional-estimate + crossfade shape as the
reference's time-domain AR extrapolation (``arinpaint.m:46-50``).

Everything is static-shape, vmap/jit-friendly (cummax scans for the
boundary indices, gathers for the boundary phases): one fused XLA program,
no per-gap Python.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["princarg", "extrapolate_phase", "window_clear_frame_mask"]


def princarg(x: jnp.ndarray) -> jnp.ndarray:
    """Principal phase argument: wrap to (-pi, pi]."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


def window_clear_frame_mask(
    sample_valid: jnp.ndarray, n_frames: int, hop_length: int, n_fft: int,
    win_length: int | None = None,
) -> jnp.ndarray:
    """Frames whose analysis window touches NO invalid sample.

    The hole/valid frame rules used for model inputs (``ops/gaps``) mark a
    frame "valid" as soon as its CENTER lies outside the gap — but with
    ``center=True`` the window spans ``t*hop ± n_fft//2``, so frames next
    to a gap still derive (phase) information from the lost samples.  Any
    phase fed to a no-oracle reconstruction must come from frames that
    pass THIS stricter mask.

    ``sample_valid``: ``(B, S)`` 1=valid sample.  ``win_length`` is the
    actual window support (centrally zero-padded to ``n_fft``); defaults
    to ``n_fft`` when omitted.  Returns ``(B, N)``.
    """
    wl = win_length if win_length is not None else n_fft
    inv = (sample_valid < 0.5).astype(jnp.int32)
    c = jnp.cumsum(inv, axis=-1)
    c = jnp.pad(c, ((0, 0), (1, 0)))  # c[:, i] = # invalid samples < i
    S = sample_valid.shape[-1]
    centers = jnp.arange(n_frames) * hop_length
    # Window support is [center - wl//2, center + (wl - wl//2)): for odd
    # wl the right half extends one sample further than the left.
    lo = jnp.clip(centers - wl // 2, 0, S)
    hi = jnp.clip(centers + (wl - wl // 2), 0, S)
    overlap = c[:, hi] - c[:, lo]
    return (overlap == 0).astype(sample_valid.dtype)


def extrapolate_phase(
    phase: jnp.ndarray,
    frame_valid: jnp.ndarray,
    hop_length: int,
    n_fft: int,
) -> jnp.ndarray:
    """Replace the phase of invalid (gap) frames with a phase-vocoder
    extrapolation from the nearest valid frames on each side.

    Parameters
    ----------
    phase: ``(B, F, N)`` phase of the impaired STFT (radians).
    frame_valid: ``(B, N)`` 1.0 where the frame is trustworthy, 0.0 for
        gap frames (the frame-domain mask convention of ``ops/gaps``).
    hop_length, n_fft: the STFT grid (defines the expected per-hop
        advance ``omega``).

    Returns ``(B, F, N)`` phase; valid frames pass through unchanged.
    """
    B, F, N = phase.shape
    t = jnp.arange(N)
    valid = frame_valid > 0.5

    # Last valid frame index <= t (running max of t over valid frames);
    # -1 where no valid frame exists yet.
    idx_l = jnp.where(valid, t[None, :], -1)
    lv = jax.lax.associative_scan(jnp.maximum, idx_l, axis=1)
    # First valid frame index >= t; N where none remains.
    idx_r = jnp.where(valid, t[None, :], N)
    rv = jax.lax.associative_scan(
        jnp.minimum, idx_r[:, ::-1], axis=1
    )[:, ::-1]

    def take(p, i):
        # p: (B, F, N); i: (B, N) -> (B, F, N) gathered along frames
        return jnp.take_along_axis(
            p, jnp.broadcast_to(i[:, None, :], (B, F, N)).clip(0, N - 1), axis=2
        )

    omega = (2.0 * jnp.pi * hop_length / n_fft) * jnp.arange(F)
    omega = omega[None, :, None]

    def frame_is_valid(i):
        # (B, N) gather of the validity of frame index i (i may be out of
        # range; clipped positions are masked by the callers' own checks)
        return jnp.take_along_axis(
            valid.astype(jnp.int32), i.clip(0, N - 1), axis=1
        ).astype(bool)

    # Left boundary: measured advance between the two last valid frames.
    # The pair (lv-1, lv) only measures a real instantaneous frequency if
    # BOTH frames are valid; otherwise (gap at the clip edge, or valid runs
    # of length 1 between close gaps) fall back to the nominal bin advance
    # omega -- never measure across a gap frame's garbage phase.
    lv2 = lv - 1
    l_ok = ((lv2 >= 0) & frame_is_valid(lv2))[:, None, :]
    ph_l = take(phase, lv)
    dphi_l = jnp.where(
        l_ok, princarg(ph_l - take(phase, lv2) - omega) + omega, omega
    )
    steps_l = (t[None, :] - lv).clip(0)[:, None, :]
    ph_ext_l = ph_l + steps_l * dphi_l

    # Right boundary: measured advance into the first two valid frames.
    rv2 = rv + 1
    r_ok = ((rv2 <= N - 1) & frame_is_valid(rv2))[:, None, :]
    ph_r = take(phase, rv)
    dphi_r = jnp.where(
        r_ok, princarg(take(phase, rv2) - ph_r - omega) + omega, omega
    )
    steps_r = (rv - t[None, :]).clip(0)[:, None, :]
    ph_ext_r = ph_r - steps_r * dphi_r

    # Complex-domain crossfade (cos^2-equivalent weights in time, like
    # ``arinpaint.m:46-50``); a side with no valid frame gets weight 0.
    has_l = (lv >= 0)[:, None, :]
    has_r = (rv <= N - 1)[:, None, :]
    span = (rv - lv).clip(1)[:, None, :]
    w_l = jnp.where(has_l, (rv[:, None, :] - t[None, None, :]) / span, 0.0)
    w_l = jnp.sin(0.5 * jnp.pi * w_l) ** 2
    w_l = jnp.where(has_r, w_l, jnp.where(has_l, 1.0, 0.0))
    w_r = jnp.where(has_r, 1.0 - w_l, 0.0)

    blended = w_l * jnp.exp(1j * ph_ext_l) + w_r * jnp.exp(1j * ph_ext_r)
    # Guard the angle of an exactly-cancelling blend.
    blended = jnp.where(jnp.abs(blended) < 1e-12, 1.0 + 0.0j, blended)
    ext = jnp.angle(blended)

    return jnp.where(valid[:, None, :], phase, ext)
