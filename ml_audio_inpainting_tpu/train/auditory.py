"""Auditory-model quality metric: a PEMO-Q-class PSM score.

The reference's primary perceptual score is PEMO-Q's ``audioqual``
(``models/AudioReg/train.m:200``, ``model_eval.m:65``) -- the
Dau/Huber-Kollmeier effective auditory model followed by a
cross-correlation of internal representations (PSM).  That toolbox is
proprietary MATLAB; this module implements the same model class, openly and
TPU-first:

1. **Gammatone filterbank** -- 4th-order gammatones on an ERB-spaced grid,
   applied as one batched FFT-domain convolution (every channel in
   parallel; no sequential filtering).
2. **Hair-cell transduction** -- half-wave rectification + 1 kHz lowpass
   (FFT-domain one-pole).
3. **Adaptation** -- log compression (the steady-state response of PEMO's
   adaptation-loop cascade) after frame-rate downsampling.
4. **Modulation lowpass** -- 8 Hz one-pole over the envelope frames
   (PEMO-Q's "PSM" configuration uses the low modulation band for quality
   ranking).
5. **PSM** -- channel-energy-weighted Pearson correlation between the
   internal representations of reference and test signal, in [-1, 1]
   (clean vs itself = 1, like ``audioqual``).

Everything is static-shaped jnp; ``psm_score`` jits and vmaps cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gammatone_filterbank", "internal_representation", "psm_score"]


def _erb(f: np.ndarray) -> np.ndarray:
    """Equivalent rectangular bandwidth at centre frequency ``f`` (Hz)
    (Glasberg & Moore 1990)."""
    return 24.7 + f / 9.265


def _erb_space(f_lo: float, f_hi: float, n: int) -> np.ndarray:
    """``n`` centre frequencies equally spaced on the ERB-number scale."""
    erb_lo = 21.4 * np.log10(1.0 + 0.00437 * f_lo)
    erb_hi = 21.4 * np.log10(1.0 + 0.00437 * f_hi)
    erbs = np.linspace(erb_lo, erb_hi, n)
    return (10.0 ** (erbs / 21.4) - 1.0) / 0.00437


@functools.lru_cache(maxsize=16)
def _gammatone_kernel_fft(
    sample_rate: int,
    n_channels: int,
    f_lo: float,
    f_hi: float,
    kernel_len: int,
    nfft: int,
):
    """Frequency response ``(n_channels, nfft//2+1)`` complex64 of the
    gammatone bank, peak-gain-normalized per channel.  Host-computed numpy
    (cached) so jit traces embed a ready constant instead of
    constant-folding a large pad+FFT on every compile."""
    fc = _erb_space(f_lo, f_hi, n_channels)
    b = 1.019 * _erb(fc)
    t = np.arange(kernel_len) / sample_rate
    g = (
        t[None, :] ** 3
        * np.exp(-2.0 * np.pi * b[:, None] * t[None, :])
        * np.cos(2.0 * np.pi * fc[:, None] * t[None, :])
    )
    H = np.abs(np.fft.rfft(g, n=4 * kernel_len, axis=-1))
    g = g / H.max(axis=-1, keepdims=True)
    return np.fft.rfft(g, n=nfft, axis=-1).astype(np.complex64)


def gammatone_filterbank(
    x: jnp.ndarray,
    sample_rate: int = 16000,
    n_channels: int = 30,
    f_lo: float = 80.0,
    f_hi: float = 7000.0,
    kernel_len: int = 2048,
) -> jnp.ndarray:
    """``(..., T)`` -> ``(..., n_channels, T)`` via FFT-domain convolution."""
    T = x.shape[-1]
    nfft = 1
    while nfft < T + kernel_len:
        nfft *= 2
    K = jnp.asarray(
        _gammatone_kernel_fft(sample_rate, n_channels, f_lo, f_hi, kernel_len, nfft)
    )  # (C, F)
    X = jnp.fft.rfft(x, n=nfft)[..., None, :]  # (..., 1, F)
    y = jnp.fft.irfft(X * K, n=nfft)[..., :T]
    return y


def internal_representation(
    x: jnp.ndarray,
    sample_rate: int = 16000,
    n_channels: int = 30,
    frame: int = 160,
    mod_cutoff_hz: float = 8.0,
) -> jnp.ndarray:
    """Auditory internal representation ``(..., C, n_frames)``.

    Gammatone -> half-wave rectify -> 1 kHz lowpass -> 100 Hz frame
    downsample -> log adaptation -> 8 Hz modulation lowpass.
    """
    bands = gammatone_filterbank(x, sample_rate, n_channels)
    env = jnp.maximum(bands, 0.0)

    # 1 kHz hair-cell lowpass in the FFT domain (one-pole magnitude).
    T = env.shape[-1]
    nfft = 1
    while nfft < T:
        nfft *= 2
    freqs = jnp.fft.rfftfreq(nfft, 1.0 / sample_rate)
    lp = 1.0 / (1.0 + 1j * (freqs / 1000.0))
    env = jnp.fft.irfft(jnp.fft.rfft(env, n=nfft) * lp, n=nfft)[..., :T]
    env = jnp.maximum(env, 0.0)

    # Frame-rate downsample (10 ms mean) -> adaptation -> modulation LP.
    n_frames = T // frame
    env = env[..., : n_frames * frame]
    env = env.reshape(env.shape[:-1] + (n_frames, frame)).mean(axis=-1)
    env = jnp.log1p(env / 1e-4)  # adaptation-loop steady state (dB-like)

    frame_rate = sample_rate / frame
    mfreqs = jnp.fft.rfftfreq(n_frames, 1.0 / frame_rate)
    mlp = 1.0 / (1.0 + 1j * (mfreqs / mod_cutoff_hz))
    env = jnp.real(
        jnp.fft.irfft(jnp.fft.rfft(env, n=n_frames) * mlp, n=n_frames)
    )
    return env


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_channels"))
def psm_score(
    reference: jnp.ndarray,
    test: jnp.ndarray,
    sample_rate: int = 16000,
    n_channels: int = 30,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """PSM in [-1, 1]: energy-weighted correlation of internal
    representations (PEMO-Q ``audioqual`` class; ``train.m:200``).

    Batched over leading axes of ``(..., T)`` inputs.
    """
    R = internal_representation(reference, sample_rate, n_channels)
    Y = internal_representation(test, sample_rate, n_channels)

    # Per-channel Pearson correlation over frames.
    Rm = R - R.mean(axis=-1, keepdims=True)
    Ym = Y - Y.mean(axis=-1, keepdims=True)
    num = jnp.sum(Rm * Ym, axis=-1)
    den = jnp.sqrt(jnp.sum(Rm**2, axis=-1) * jnp.sum(Ym**2, axis=-1)) + eps
    corr = num / den  # (..., C)

    # Weight channels by reference representation variance so silent
    # channels cannot dominate.
    w = jnp.sum(Rm**2, axis=-1) + eps
    return jnp.sum(corr * w, axis=-1) / jnp.sum(w, axis=-1)
