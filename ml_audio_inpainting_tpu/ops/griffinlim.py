"""On-device Griffin-Lim phase reconstruction.

The reference calls ``librosa.griffinlim`` with 64 host-side iterations per
clip (``utils.py:330-333``).  Here the whole iteration runs on-device as a
``lax.fori_loop`` over batched STFT/iSTFT, so phase recovery for a full batch
of spectrograms is one jitted XLA program with no host round-trips
(SURVEY.md §7 "Griffin-Lim cost").

Matches librosa's accelerated (momentum) Griffin-Lim update with
``momentum=0.99`` and random phase init by default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ml_audio_inpainting_tpu.ops.stft import istft, stft

__all__ = ["griffinlim"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter",
        "n_fft",
        "hop_length",
        "win_length",
        "window",
        "center",
        "length",
        "momentum",
        "init",
    ),
)
def griffinlim(
    mag: jnp.ndarray,
    n_iter: int = 64,
    n_fft: Optional[int] = None,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
    momentum: float = 0.99,
    init: str = "random",
    key: Optional[jax.Array] = None,
    init_phase: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reconstruct audio from a magnitude spectrogram ``(..., F, N)``.

    Parameters mirror the reference's ``spectrogram_to_audio`` Griffin-Lim
    branch (``utils.py:330-333``): 64 iterations by default.
    """
    if n_fft is None:
        n_fft = 2 * (mag.shape[-2] - 1)
    if momentum < 0 or momentum >= 1:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")

    real_dtype = mag.dtype
    cplx = jnp.complex64 if real_dtype != jnp.float64 else jnp.complex128

    if init == "given":
        # Warm-start from a caller-supplied phase array (radians) -- e.g. the
        # impaired signal's phase when refining an inpainted gap region.
        if init_phase is None:
            raise ValueError("init='given' requires init_phase")
        angles = jnp.exp(1j * init_phase.astype(cplx))
    elif init == "random":
        if key is None:
            key = jax.random.PRNGKey(0)
        phase = jax.random.uniform(key, mag.shape, dtype=real_dtype, maxval=2 * jnp.pi)
        angles = jnp.exp(1j * phase.astype(cplx))
    elif init in ("ones", "zeros"):
        angles = jnp.ones(mag.shape, dtype=cplx)
    else:
        raise ValueError(f"init must be 'random', 'ones', or 'given', got {init!r}")

    eps = jnp.finfo(real_dtype).tiny
    mag_c = mag.astype(cplx)

    def body(_, carry):
        angles, rebuilt = carry
        inverse = istft(
            mag_c * angles,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            window=window,
            center=center,
            length=length,
        )
        new_rebuilt = stft(
            inverse,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            window=window,
            center=center,
        )
        new_angles = new_rebuilt - (momentum / (1 + momentum)) * rebuilt
        new_angles = new_angles / (jnp.abs(new_angles) + eps)
        return new_angles, new_rebuilt

    rebuilt0 = jnp.zeros_like(mag_c)
    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, rebuilt0))

    return istft(
        mag_c * angles,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=window,
        center=center,
        length=length,
    )
