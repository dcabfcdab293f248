"""TPU compute ops: STFT/iSTFT, Griffin-Lim, mel, gap masks, normalizations.

This is the L0 DSP layer of the framework (reference: ``utils.py`` +
``config.py``), rebuilt as batched, jittable JAX ops.
"""

from ml_audio_inpainting_tpu.ops.gaps import (
    apply_gap,
    frame_mask_from_interval,
    gap_mask,
    random_gap_mask,
)
from ml_audio_inpainting_tpu.ops.griffinlim import griffinlim
from ml_audio_inpainting_tpu.ops.masking import (
    amplitude_to_db,
    composite,
    db_to_amplitude,
    invert_mask,
    log1p_denorm,
    log1p_norm,
    log10_denorm,
    log10_norm,
    power_to_db,
)
from ml_audio_inpainting_tpu.ops.linalg import (
    ar_coef_autocorr,
    arburg,
    autocorrelation,
    levinson,
    lpc,
)
from ml_audio_inpainting_tpu.ops.lstm import BiLSTM, lstm_scan
from ml_audio_inpainting_tpu.ops.pcm import from_pcm16, to_pcm16
from ml_audio_inpainting_tpu.ops.reconstruct import spectrogram_to_audio
from ml_audio_inpainting_tpu.ops.mel import mel_filterbank, mel_spectrogram, mel_to_audio
from ml_audio_inpainting_tpu.ops.stft import (
    frame_signal,
    get_window,
    istft,
    magnitude,
    num_frames,
    pad_center,
    stft,
)

__all__ = [
    "apply_gap",
    "frame_mask_from_interval",
    "gap_mask",
    "random_gap_mask",
    "griffinlim",
    "amplitude_to_db",
    "composite",
    "db_to_amplitude",
    "invert_mask",
    "log1p_denorm",
    "log1p_norm",
    "log10_denorm",
    "log10_norm",
    "power_to_db",
    "ar_coef_autocorr",
    "arburg",
    "autocorrelation",
    "levinson",
    "lpc",
    "BiLSTM",
    "lstm_scan",
    "to_pcm16",
    "from_pcm16",
    "spectrogram_to_audio",
    "mel_filterbank",
    "mel_spectrogram",
    "mel_to_audio",
    "frame_signal",
    "get_window",
    "istft",
    "magnitude",
    "num_frames",
    "pad_center",
    "stft",
]
