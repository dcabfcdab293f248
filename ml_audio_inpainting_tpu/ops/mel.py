"""Mel filterbanks and mel spectrograms (librosa-compatible Slaney scale).

Reference capability: ``extract_mel_spectrogram`` (``utils.py:236-277``) and
``mel_spectrogram_to_audio`` (``utils.py:335-393``, pinv-based inversion +
Griffin-Lim).  The filterbank is built host-side once (NumPy, float64) and the
projection runs on-device as a single matmul that XLA maps onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.ops.griffinlim import griffinlim
from ml_audio_inpainting_tpu.ops.stft import stft

__all__ = ["mel_filterbank", "mel_spectrogram", "mel_to_audio", "hz_to_mel", "mel_to_hz"]


def hz_to_mel(freq, htk: bool = False):
    """Hz -> mel (Slaney by default, matching librosa)."""
    freq = np.asanyarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(mels, htk: bool = False):
    """Mel -> Hz (Slaney by default, matching librosa)."""
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank ``(n_mels, 1 + n_fft // 2)``.

    Numerically equivalent to ``librosa.filters.mel`` (consumed by the
    reference at ``utils.py:367-373``).
    """
    if fmax is None:
        fmax = float(sample_rate) / 2

    fftfreqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sample_rate)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk=htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"Unsupported norm: {norm!r}")

    return weights.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "n_mels", "fmin", "fmax", "power"),
)
def mel_spectrogram(
    y: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    power: float = 2.0,
) -> jnp.ndarray:
    """Mel spectrogram of ``(..., T)`` -> ``(..., n_mels, N)``.

    Mirrors ``extract_mel_spectrogram`` (``utils.py:236-277``).
    """
    spec = stft(y, n_fft=n_fft, hop_length=hop_length)
    mag = jnp.abs(spec) ** power
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, dtype=np.float64))
    return jnp.einsum("mf,...fn->...mn", fb.astype(mag.dtype), mag)


def mel_to_audio(
    mel_spec: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_iter: int = 32,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    power: float = 2.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Invert a mel spectrogram via filterbank pseudo-inverse + Griffin-Lim.

    Mirrors ``mel_spectrogram_to_audio`` (``utils.py:335-393``), including the
    reference's square-root-after-projection order for power spectrograms.
    """
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, dtype=np.float64)
    fb_pinv = jnp.asarray(np.linalg.pinv(fb), dtype=mel_spec.dtype)
    linear = jnp.einsum("fm,...mn->...fn", fb_pinv, mel_spec)
    if power == 2.0:
        # NOTE: the reference takes sqrt of the (possibly negative) pinv
        # projection without clamping (utils.py:381-383); we clamp at 0 to
        # keep the output real. Negative leakage is tiny for speech inputs.
        linear = jnp.sqrt(jnp.maximum(linear, 0.0))
    return griffinlim(
        linear, n_iter=n_iter, n_fft=n_fft, hop_length=hop_length, key=key
    )
