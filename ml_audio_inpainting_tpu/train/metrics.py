"""Quality metrics: SDR/SNR, log-spectral distance, spectral convergence,
and a frequency-weighted perceptual proxy.

The reference evaluates with MATLAB ``snr`` restricted to gap samples
(``train.m:196``, ``model_eval.m:60``), PEMO-Q ``audioqual`` and PEAQ ODG --
both proprietary MATLAB toolboxes shipped as a missing binary blob.  Per the
benchmark plan (BASELINE.md), PEMO-Q/PEAQ are substituted with open
computable metrics: frequency-weighted segmental SNR (``fwseg_snr``) as the
perceptual-class score, plus log-spectral distance and spectral convergence.
The actual auditory-model PSM score (gammatone + adaptation + modulation
lowpass + internal-representation correlation, PEMO-Q's model class) lives
in :mod:`ml_audio_inpainting_tpu.train.auditory` and reproduces the
recorded PEMO-Q ranking on the reference's shipped reconstructions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ml_audio_inpainting_tpu.ops.stft import stft

__all__ = ["snr", "gap_sdr", "log_spectral_distance", "spectral_convergence", "fwseg_snr"]


def snr(reference: jnp.ndarray, estimate: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """``10 log10(||ref||^2 / ||ref - est||^2)`` (MATLAB ``snr(x, x - y)``)."""
    num = jnp.sum(reference**2, axis=-1)
    den = jnp.sum((reference - estimate) ** 2, axis=-1) + eps
    return 10.0 * jnp.log10(num / den + eps)


def gap_sdr(
    reference: jnp.ndarray,
    estimate: jnp.ndarray,
    gap_mask: jnp.ndarray,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """SDR restricted to gap samples (``model_eval.m:60``: ``snr`` over the
    gap region only).  ``gap_mask``: 1 = gap."""
    num = jnp.sum((reference * gap_mask) ** 2, axis=-1)
    den = jnp.sum(((reference - estimate) * gap_mask) ** 2, axis=-1) + eps
    return 10.0 * jnp.log10(num / den + eps)


def log_spectral_distance(
    reference: jnp.ndarray,
    estimate: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 128,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """RMS distance between log-power spectra, in dB."""
    pr = jnp.abs(stft(reference, n_fft=n_fft, hop_length=hop_length)) ** 2
    pe = jnp.abs(stft(estimate, n_fft=n_fft, hop_length=hop_length)) ** 2
    d = 10.0 * (jnp.log10(pr + eps) - jnp.log10(pe + eps))
    return jnp.sqrt(jnp.mean(d**2, axis=(-2, -1)))


def spectral_convergence(
    reference_mag: jnp.ndarray, estimate_mag: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """||_R - E||_F / ||R||_F over magnitude spectrograms."""
    num = jnp.sqrt(jnp.sum((reference_mag - estimate_mag) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(reference_mag**2, axis=(-2, -1))) + eps
    return num / den


def fwseg_snr(
    reference: jnp.ndarray,
    estimate: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 128,
    gamma: float = 0.2,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Frequency-weighted segmental SNR (perceptual-proxy score, dB).

    Per STFT frame, bin-wise SNR is weighted by the reference magnitude
    raised to ``gamma`` (louder bins matter more), clamped to [-10, 35] dB,
    then averaged -- a standard open stand-in for PEMO-Q/PEAQ-class scores.
    """
    mr = jnp.abs(stft(reference, n_fft=n_fft, hop_length=hop_length))
    me = jnp.abs(stft(estimate, n_fft=n_fft, hop_length=hop_length))
    w = mr**gamma
    snr_bins = 10.0 * jnp.log10((mr**2 + eps) / ((mr - me) ** 2 + eps))
    snr_bins = jnp.clip(snr_bins, -10.0, 35.0)
    return jnp.sum(w * snr_bins, axis=(-2, -1)) / (jnp.sum(w, axis=(-2, -1)) + eps)
