"""On-device 16-bit PCM quantization for the serving transport path.

The framework's deliverable audio format is 16-bit PCM (the native codec
writes 16-bit WAV/FLAC, matching the reference's ``soundfile.write``
default in ``utils.py:54-89``), but the serving functions return float32
waveforms -- so a serving loop that fetches f32 and quantizes on the host
moves 2x the bytes it needs to over the host<->device link.  On this
environment that link (the tunneled axon relay) is the measured serving
bottleneck (results/README.md: serving MFU ~2-3%, host-link-bound), so
fusing the PCM quantization into the jitted program and fetching int16
halves the dominant cost.

``to_pcm16`` follows the symmetric-scale convention used by the native
codec (``native/audioio.cpp`` WAV writer): round(x * 32767), clipped to
the int16 range; ``from_pcm16`` inverts with the same scale, so a
round-trip is exact for every representable level and the worst-case
round-trip error for |x| <= 1 is half an LSB (~1.5e-5, > 90 dB SNR --
i.e. exactly the precision of the delivered file, nothing lost relative
to fetching f32 and writing PCM on the host).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["to_pcm16", "from_pcm16"]

_SCALE = 32767.0


def to_pcm16(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize float waveforms in [-1, 1] to int16 PCM (on device).

    Values outside [-1, 1] saturate like the native codec's writer does.
    """
    return jnp.clip(jnp.round(x * _SCALE), -32768.0, 32767.0).astype(jnp.int16)


def from_pcm16(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize int16 PCM to float in [-1, 1] (inverse of ``to_pcm16``)."""
    return x.astype(dtype) / _SCALE
