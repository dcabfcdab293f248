"""Magnitude-spectrogram -> audio reconstruction convenience API.

Mirror of the reference's ``spectrogram_to_audio`` (``utils.py:279-333``):
given a magnitude spectrogram, reconstruct audio with (1) provided phase,
(2) Griffin-Lim when no phase is given, or (3) direct iSTFT when the input
is already complex/phase-bearing -- including the reference's dB-domain
auto-detection heuristic (``utils.py:313-314``: if everything is negative,
treat as dB and convert back to amplitude).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ml_audio_inpainting_tpu.ops.griffinlim import griffinlim
from ml_audio_inpainting_tpu.ops.masking import db_to_amplitude
from ml_audio_inpainting_tpu.ops.stft import istft

__all__ = ["spectrogram_to_audio"]


def spectrogram_to_audio(
    spectrogram: jnp.ndarray,
    phase: Optional[jnp.ndarray] = None,
    phase_info: bool = False,
    n_fft: int = 512,
    n_iter: int = 64,
    window: str = "hann",
    hop_length: int = 512,
    win_length: Optional[int] = None,
    center: bool = True,
    length: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Convert ``(..., F, N)`` magnitude (or complex) spectrograms to audio.

    Parameter names and defaults match the reference signature
    (``utils.py:279-288``); ``length`` and ``key`` are additions (output
    trimming, Griffin-Lim PRNG determinism).
    """
    if phase_info:
        return istft(
            spectrogram, n_fft=n_fft, hop_length=hop_length,
            win_length=win_length, window=window, center=center, length=length,
        )

    # dB heuristic (utils.py:313-314): all-negative input is treated as dB.
    if not jnp.iscomplexobj(spectrogram):
        is_db = (jnp.max(spectrogram) < 0) & (jnp.mean(spectrogram) < 0)
        spectrogram = jnp.where(is_db, db_to_amplitude(spectrogram), spectrogram)

    if phase is not None:
        return istft(
            spectrogram * jnp.exp(1j * phase), n_fft=n_fft, hop_length=hop_length,
            win_length=win_length, window=window, center=center, length=length,
        )

    return griffinlim(
        spectrogram, n_iter=n_iter, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, window=window, center=center, length=length, key=key,
    )
