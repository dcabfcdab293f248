"""Datasets: LibriSpeech-style file corpora and deterministic synthetic audio.

Design shift vs the reference (SURVEY.md §7 step 2): the host side only
decodes waveforms to fixed ``(B, max_samples)`` float32 batches.  Gap
sampling, STFT, and normalization all happen *on device* inside the jitted
train/eval step -- so the reference's per-item librosa calls in DataLoader
workers (``models/GAN/dataset.py:63-166``) and its 25x re-load/re-STFT of the
same file (``models/CNNBLSTM/dataset.py:93-119``) disappear entirely; the
waveform is decoded once and the 25 gap variants are a vmapped device op.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from ml_audio_inpainting_tpu.data.audio_io import load_audio

__all__ = ["AudioFileDataset", "SyntheticSpeechDataset", "list_audio_files"]

AUDIO_EXTENSIONS = (".flac", ".wav")


def list_audio_files(
    root: Union[str, Path], max_files: Optional[int] = None
) -> List[Path]:
    """Recursively collect audio files under ``root`` in sorted order
    (parity with the reference's sorted rglob, ``models/GAN/dataset.py:41-57``,
    ``models/CNNBLSTM/dataset.py:59-69``)."""
    root = Path(root)
    if not root.exists():
        raise ValueError(f"Path {root} does not exist")
    files = sorted(p for p in root.rglob("*") if p.suffix.lower() in AUDIO_EXTENSIONS)
    if max_files is not None:
        files = files[:max_files]
    return files


class AudioFileDataset:
    """Fixed-length waveform dataset over a directory tree of FLAC/WAV files.

    Every item is exactly ``int(sample_rate * max_len_s)`` samples
    (truncate-or-pad, the reference's audio contract, ``utils.py:39-48``).
    Decoded clips are cached in RAM (a 5 s clip is 320 KB; 3 000 clips < 1 GB),
    removing repeated decode work across epochs.
    """

    def __init__(
        self,
        root: Union[str, Path],
        sample_rate: int = 16000,
        max_len_s: float = 5.0,
        max_files: Optional[int] = None,
        cache: bool = True,
    ):
        self.files = list_audio_files(root, max_files)
        self.sample_rate = sample_rate
        self.max_len_s = max_len_s
        self.max_samples = int(sample_rate * max_len_s)
        self._cache: Optional[dict] = {} if cache else None

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        audio, _ = load_audio(
            self.files[idx], sample_rate=self.sample_rate, max_len=self.max_len_s
        )
        if self._cache is not None:
            self._cache[idx] = audio
        return audio


class SyntheticSpeechDataset:
    """Deterministic speech-like corpus for tests and benchmarks.

    Each item is an AM-modulated harmonic stack with item-dependent f0,
    modulation, and noise floor -- statistically close enough to speech to
    exercise the full pipeline without a LibriSpeech download (the reference
    hard-codes local LibriSpeech paths, ``config.py:11-16``).
    """

    def __init__(
        self,
        n_items: int = 128,
        sample_rate: int = 16000,
        max_len_s: float = 5.0,
        seed: int = 0,
    ):
        self.n_items = n_items
        self.sample_rate = sample_rate
        self.max_samples = int(sample_rate * max_len_s)
        self.seed = seed

    def __len__(self) -> int:
        return self.n_items

    def __getitem__(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(
            int.from_bytes(
                hashlib.blake2s(f"{self.seed}:{idx}".encode(), digest_size=8).digest(),
                "little",
            )
        )
        t = np.arange(self.max_samples) / self.sample_rate
        f0 = rng.uniform(90, 250) + rng.uniform(10, 50) * np.sin(
            2 * np.pi * rng.uniform(0.3, 1.5) * t
        )
        phase = 2 * np.pi * np.cumsum(f0) / self.sample_rate
        sig = sum(
            (rng.uniform(0.2, 0.6) / k) * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
            for k in range(1, 7)
        )
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(1.0, 4.0) * t + rng.uniform(0, 2 * np.pi)))
        sig = env * sig + 0.01 * rng.standard_normal(self.max_samples)
        return (sig / np.max(np.abs(sig))).astype(np.float32)
