"""Normalizations, mask-convention adapters, compositing, dB conversions.

Centralizes the reference-wide numeric contracts (SURVEY.md §2.7):

* GAN normalization:      ``log1p(|S|)``        (``models/GAN/dataset.py:122``)
* CNNBLSTM normalization: ``log10(|S| + 1e-9)`` with ``10 **`` inversion
                          (``models/CNNBLSTM/dataset.py:106``, ``train.py:104``)
* Mask conventions: canonical here is 1 = valid / 0 = gap (GAN,
  ``dataset.py:149-152``); CNNBLSTM uses the inverse (1 = gap,
  ``dataset.py:115-118``) -- adapt at the model boundary with ``invert_mask``.
* Compositing rule: output = prediction inside the gap + untouched input
  outside (``models/CNNBLSTM/model.py:107``, GAN ``train.py:473``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "log1p_norm",
    "log1p_denorm",
    "log10_norm",
    "log10_denorm",
    "invert_mask",
    "composite",
    "amplitude_to_db",
    "db_to_amplitude",
    "power_to_db",
]

LOG10_EPS = 1e-9  # models/CNNBLSTM/dataset.py:106


def log1p_norm(mag: jnp.ndarray) -> jnp.ndarray:
    """GAN-profile spectrogram normalization (``models/GAN/dataset.py:122``)."""
    return jnp.log1p(mag)


def log1p_denorm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.expm1(x)


def log10_norm(mag: jnp.ndarray) -> jnp.ndarray:
    """CNNBLSTM-profile normalization (``models/CNNBLSTM/dataset.py:106``)."""
    return jnp.log10(mag + LOG10_EPS)


def log10_denorm(x: jnp.ndarray) -> jnp.ndarray:
    """Inversion used by the reference at ``models/CNNBLSTM/test.py:85``."""
    return 10.0**x


def invert_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Swap between 1=valid (canonical/GAN) and 1=gap (CNNBLSTM) conventions."""
    return 1.0 - mask


def composite(prediction: jnp.ndarray, original: jnp.ndarray, valid_mask: jnp.ndarray) -> jnp.ndarray:
    """Keep the model output only inside the gap (valid_mask == 0).

    ``valid_mask`` uses the canonical convention (1 = valid).  Equivalent to
    the reference's ``out * gap_mask + input * (1 - gap_mask)``
    (``models/CNNBLSTM/model.py:107``) after convention inversion.
    """
    return original * valid_mask + prediction * (1.0 - valid_mask)


def amplitude_to_db(
    mag: jnp.ndarray, ref: float | jnp.ndarray = 1.0, amin: float = 1e-5, top_db: float = 80.0
) -> jnp.ndarray:
    """librosa-style amplitude->dB (used for visualization, ``utils.py:437``)."""
    power = jnp.square(jnp.maximum(mag, amin))
    ref_p = jnp.square(jnp.maximum(jnp.asarray(ref, mag.dtype), amin))
    db = 10.0 * (jnp.log10(power) - jnp.log10(ref_p))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


def db_to_amplitude(db: jnp.ndarray, ref: float = 1.0) -> jnp.ndarray:
    """Inverse of ``amplitude_to_db`` -- the reference applies this
    heuristically when a spectrogram looks dB-scaled (``utils.py:313-314``)."""
    return ref * jnp.power(10.0, 0.5 * db / 10.0)


def power_to_db(
    power: jnp.ndarray, ref: float | jnp.ndarray = 1.0, amin: float = 1e-5, top_db: float = 80.0
) -> jnp.ndarray:
    p = jnp.maximum(power, amin)
    ref_p = jnp.maximum(jnp.asarray(ref, power.dtype), amin)
    db = 10.0 * (jnp.log10(p) - jnp.log10(ref_p))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db
