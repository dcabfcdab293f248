"""Host-side audio I/O: native C++ FLAC/WAV codec with ctypes bindings.

The reference's audio I/O is librosa/soundfile (C-backed libsndfile) at
``utils.py:14-89``.  This framework ships its own native codec
(``native/audioio.cpp``): a full FLAC decoder (verified against the MD5
signature embedded in every FLAC STREAMINFO header), a fixed-predictor FLAC
encoder, and WAV PCM/float support.  The library is compiled on first use
with the system toolchain and cached.

Public API mirrors the reference's contract:

* :func:`load_audio`  -- decode, mixdown to mono, resample to target rate,
  truncate-or-zero-pad to ``max_len`` seconds (``utils.py:14-52``).
* :func:`save_audio`  -- peak-normalize, auto-mkdir, write FLAC/WAV
  (``utils.py:54-89``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libaudioio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class AudioIOError(IOError):
    """Raised on decode/encode failures (parity with the reference's IOError
    wrapping, ``utils.py:51-52``)."""


def _build_native() -> None:
    src = _NATIVE_DIR / "audioio.cpp"
    _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        str(src),
        "-o",
        str(_LIB_PATH),
        "-ldl",  # dlopen of the system MP3 codec (pre-glibc-2.34 hosts)
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = _NATIVE_DIR / "audioio.cpp"
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            _build_native()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.mai_read_audio.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.mai_read_audio.restype = ctypes.c_int
        lib.mai_write_audio.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.mai_write_audio.restype = ctypes.c_int
        lib.mai_free.argtypes = [ctypes.c_void_p]
        lib.mai_free.restype = None
        _lib = lib
        return lib


def read_audio(path: Union[str, Path]) -> Tuple[np.ndarray, int, int]:
    """Decode a FLAC/WAV file -> ``(samples (frames, channels), rate, md5_ok)``.

    ``md5_ok`` is 1 if the FLAC stream's embedded MD5 matched the decode,
    0 on mismatch, -1 when not applicable (WAV, or no MD5 in header).
    """
    lib = _load_lib()
    data = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    md5_ok = ctypes.c_int32()
    err = ctypes.create_string_buffer(256)
    rc = lib.mai_read_audio(
        str(path).encode(), ctypes.byref(data), ctypes.byref(frames),
        ctypes.byref(channels), ctypes.byref(rate), ctypes.byref(md5_ok),
        err, len(err),
    )
    if rc != 0:
        raise AudioIOError(f"Error loading audio file {path}: {err.value.decode()}")
    n = frames.value * channels.value
    try:
        out = np.ctypeslib.as_array(data, shape=(n,)).reshape(frames.value, channels.value).copy()
    finally:
        lib.mai_free(data)
    return out, rate.value, md5_ok.value


def write_audio(
    path: Union[str, Path],
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    file_format: Optional[str] = None,
) -> None:
    """Encode float32 samples (``(frames,)`` or ``(frames, channels)``) to
    FLAC (default) or WAV."""
    lib = _load_lib()
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    if file_format is None:
        file_format = Path(path).suffix.lstrip(".").lower() or "flac"
    fmt_code = 1 if file_format == "wav" else 0
    flat = np.ascontiguousarray(samples.reshape(-1))
    err = ctypes.create_string_buffer(256)
    rc = lib.mai_write_audio(
        str(path).encode(),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        samples.shape[0],
        samples.shape[1],
        sample_rate,
        bits,
        fmt_code,
        err,
        len(err),
    )
    if rc != 0:
        raise AudioIOError(f"Error saving audio to {path}: {err.value.decode()}")


def resample(audio: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    """Polyphase resampling (host side; LibriSpeech is already 16 kHz so this
    path is rarely exercised, matching ``librosa.load(sr=...)`` behavior)."""
    if orig_rate == target_rate:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_rate, target_rate)
    return resample_poly(audio, target_rate // g, orig_rate // g).astype(audio.dtype)


def load_audio(
    file_path: Union[str, Path],
    sample_rate: int = 16000,
    max_len: float = 5.0,
    mono: bool = True,
) -> Tuple[np.ndarray, int]:
    """Load an audio file: mono mixdown, resample, truncate-or-pad.

    Behavioral contract of the reference's ``load_audio`` (``utils.py:14-52``):
    returns ``(audio_data, sample_rate)`` with exactly
    ``int(sample_rate * max_len)`` samples.
    """
    try:
        samples, rate, _ = read_audio(file_path)
    except AudioIOError:
        raise
    except Exception as e:  # parity: wrap every failure in IOError
        raise AudioIOError(f"Error loading audio file {file_path}: {e}")

    audio = samples.mean(axis=1) if (mono and samples.shape[1] > 1) else samples[:, 0]
    audio = resample(audio, rate, sample_rate)

    max_samples = int(sample_rate * max_len)
    if len(audio) > max_samples:
        audio = audio[:max_samples]
    else:
        audio = np.pad(audio, (0, max_samples - len(audio)))
    return np.ascontiguousarray(audio, dtype=np.float32), sample_rate


def save_audio(
    audio_data: np.ndarray,
    file_path: Union[str, Path],
    sample_rate: int = 16000,
    normalize: bool = True,
    file_format: str = "flac",
) -> None:
    """Save audio with peak normalization and auto-mkdir (``utils.py:54-89``)."""
    out_dir = Path(file_path).parent
    if out_dir and not out_dir.exists():
        try:
            out_dir.mkdir(parents=True, exist_ok=True)
        except Exception as e:
            raise AudioIOError(f"Error creating directory {out_dir}: {e}")

    audio_data = np.asarray(audio_data, dtype=np.float32)
    if normalize:
        peak = np.max(np.abs(audio_data))
        if peak > 0:
            audio_data = audio_data / peak
    write_audio(file_path, audio_data, sample_rate, file_format=file_format)
