"""Batched STFT / iSTFT with librosa-compatible semantics, in pure JAX.

The reference computes spectrograms on the host, one clip at a time, with
librosa (``utils.py:192-234`` calls ``librosa.stft``; ``utils.py:279-333``
calls ``librosa.istft``/``librosa.griffinlim``).  Here the transform is a
first-class batched device op: waveforms of shape ``(..., T)`` go in, complex
spectrograms of shape ``(..., F, N)`` come out, everything jit/vmap/pjit
friendly with static shapes so XLA can fuse the framing, windowing and FFT.

Numeric contract (SURVEY.md §2.7): two STFT profiles must be reproduced
exactly --

* GAN:       n_fft=512, hop=128, win=512, hann  -> (257, 626) on 80 000 samples
* CNNBLSTM:  n_fft=512, hop=192, win=384, hann  -> (257, 417)

Conventions matched to librosa >= 0.10:

* periodic Hann window (``scipy.signal.get_window('hann', n, fftbins=True)``)
* ``win_length`` windows are zero-padded *centrally* to ``n_fft``
* ``center=True`` pads the signal by ``n_fft // 2`` on both sides
  (zero padding -- librosa's modern default ``pad_mode='constant'``)
* ``n_frames = 1 + T // hop`` for centered transforms
* iSTFT normalizes by the summed squared window (NOLA) and trims the
  ``n_fft // 2`` centering pad.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_window",
    "pad_center",
    "frame_signal",
    "stft",
    "istft",
    "magnitude",
    "num_frames",
]


def get_window(window: str, win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic (DFT-even) analysis windows, matching scipy/librosa defaults."""
    n = np.arange(win_length, dtype=np.float64)
    if window in ("hann", "hanning"):
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    elif window == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)
    elif window in ("rect", "rectangular", "boxcar", "ones"):
        w = np.ones(win_length, dtype=np.float64)
    elif window == "blackman":
        w = (
            0.42
            - 0.5 * np.cos(2.0 * np.pi * n / win_length)
            + 0.08 * np.cos(4.0 * np.pi * n / win_length)
        )
    else:
        raise ValueError(f"Unsupported window type: {window!r}")
    return jnp.asarray(w, dtype=dtype)


def pad_center(window: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-pad a window to ``size`` samples (librosa ``util.pad_center``)."""
    n = window.shape[-1]
    if n > size:
        raise ValueError(f"window length {n} > target size {size}")
    lpad = (size - n) // 2
    return jnp.pad(window, (lpad, size - n - lpad))


def num_frames(n_samples: int, hop_length: int, n_fft: int, center: bool = True) -> int:
    """Number of STFT frames produced for a signal of ``n_samples``."""
    if center:
        return 1 + n_samples // hop_length
    return 1 + (n_samples - n_fft) // hop_length


def frame_signal(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``(..., T)`` into overlapping frames ``(..., N, frame_length)``.

    Implemented as a static gather so XLA lowers it to a single fused
    dynamic-slice pattern; shapes are fully static under jit.
    """
    n = 1 + (y.shape[-1] - frame_length) // hop_length
    idx = (
        np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )  # (N, frame_length), host-computed constant
    return y[..., idx]


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "window", "center", "pad_mode"),
)
def stft(
    y: jnp.ndarray,
    n_fft: int = 512,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Short-time Fourier transform of ``(..., T)`` -> complex ``(..., F, N)``.

    Matches ``librosa.stft`` numerics (see module docstring); the reference
    exposes this via ``extract_spectrogram`` (``utils.py:192-234``).
    """
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft

    win = pad_center(get_window(window, win_length, dtype=y.dtype), n_fft)

    if center:
        pad = n_fft // 2
        widths = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y = jnp.pad(y, widths, mode=pad_mode)

    frames = frame_signal(y, n_fft, hop_length)  # (..., N, n_fft)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)  # (..., N, F)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, N)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "window", "center", "length"),
)
def istft(
    spec: jnp.ndarray,
    n_fft: Optional[int] = None,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT of complex ``(..., F, N)`` -> ``(..., T)``.

    NOLA-normalized overlap-add, matching ``librosa.istft`` (used by the
    reference's ``spectrogram_to_audio``, ``utils.py:279-333``).
    """
    if n_fft is None:
        n_fft = 2 * (spec.shape[-2] - 1)
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft

    real_dtype = jnp.real(spec).dtype
    win = pad_center(get_window(window, win_length, dtype=real_dtype), n_fft)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # (..., N, n_fft)
    frames = frames * win

    n = frames.shape[-2]
    total = n_fft + hop_length * (n - 1)

    # Overlap-add via scatter-add over static frame offsets.
    idx = np.arange(n)[:, None] * hop_length + np.arange(n_fft)[None, :]
    out = jnp.zeros(frames.shape[:-2] + (total,), dtype=real_dtype)
    out = out.at[..., idx.reshape(-1)].add(frames.reshape(frames.shape[:-2] + (-1,)))

    # Window-sum-square normalization (NOLA).
    wss = jnp.zeros((total,), dtype=real_dtype)
    wss = wss.at[idx.reshape(-1)].add(jnp.tile(win * win, n))
    tiny = jnp.finfo(real_dtype).tiny
    out = jnp.where(wss > tiny, out / jnp.where(wss > tiny, wss, 1.0), out)

    start = n_fft // 2 if center else 0
    if length is not None:
        end = start + length
    else:
        end = total - start
    out = out[..., start : min(end, total)]
    if length is not None and out.shape[-1] < length:
        widths = [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])]
        out = jnp.pad(out, widths)
    return out


def magnitude(spec: jnp.ndarray, power: float = 1.0) -> jnp.ndarray:
    """|S|**power -- the reference's magnitude extraction (``dataset.py:121``)."""
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    return mag
