"""Loss functions for both model families.

Numerics match the reference exactly:

* CNNBLSTM: sum-reduced L1 on the gap region only, comparing the linearized
  prediction ``10**pred`` against the linear target magnitude
  (``models/CNNBLSTM/train.py:104`` -- the input/output are log10-domain).
* GAN: the 6-term generator objective of ``calculate_losses``
  (``models/GAN/train.py:33-88``) with YAML lambda weights
  (``config.yaml:39-44``), plus the BCE discriminator loss
  (``train.py:347-363``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

__all__ = [
    "bce_with_logits",
    "cnn_gap_l1_loss",
    "cnn_phase_l1_loss",
    "generator_losses",
    "discriminator_loss",
]


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (torch ``BCEWithLogitsLoss``)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def cnn_gap_l1_loss(
    log_pred: jnp.ndarray, target_mag: jnp.ndarray, gap_mask: jnp.ndarray
) -> jnp.ndarray:
    """CNNBLSTM training loss (``models/CNNBLSTM/train.py:104``).

    ``log_pred`` is the model's log10-domain output; the loss compares
    linear magnitudes inside the gap (mask 1 = gap), sum-reduced.
    """
    pred_lin = 10.0**log_pred
    return jnp.sum(jnp.abs(pred_lin * gap_mask - target_mag * gap_mask))


def cnn_phase_l1_loss(
    pred_channels: jnp.ndarray, target_complex: jnp.ndarray, gap_mask: jnp.ndarray
) -> jnp.ndarray:
    """Complex L1 on the gap region for the phase-mode model.

    ``pred_channels``: ``(B, F, T, 2)`` real/imag output; the loss is the
    summed modulus of the complex error inside the gap (the reference's
    complex L1 variant, ``old/train_v2_phase.py:87-92``).
    """
    pred_c = pred_channels[..., 0] + 1j * pred_channels[..., 1]
    err = (pred_c - target_complex) * gap_mask
    return jnp.sum(jnp.abs(err))


def generator_losses(
    generated_mag: jnp.ndarray,
    original_mag: jnp.ndarray,
    mask: jnp.ndarray,
    d_fake_logits: jnp.ndarray,
    lambdas: Dict[str, float],
    vgg_losses: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """The 6-term generator objective (``models/GAN/train.py:33-88``).

    ``mask``: 1 = valid / 0 = hole.  L1 terms are sum-reduced and normalized
    by mask pixel counts (+1e-8), exactly as the reference.
    """
    g_adv = bce_with_logits(d_fake_logits, jnp.ones_like(d_fake_logits))

    valid_cnt = jnp.sum(mask) + 1e-8
    g_l1_valid = jnp.sum(jnp.abs(generated_mag * mask - original_mag * mask)) / valid_cnt

    hole = 1.0 - mask
    hole_cnt = jnp.sum(hole) + 1e-8
    g_l1_hole = jnp.sum(jnp.abs(generated_mag * hole - original_mag * hole)) / hole_cnt

    g_mag_weighted = jnp.mean(
        jnp.abs(generated_mag - original_mag) * jnp.abs(original_mag)
    )

    g_vgg_p, g_vgg_s = vgg_losses if vgg_losses is not None else (
        jnp.zeros(()),
        jnp.zeros(()),
    )

    g_total = (
        lambdas["lambda_adv"] * g_adv
        + lambdas["lambda_l1_valid"] * g_l1_valid
        + lambdas["lambda_l1_hole"] * g_l1_hole
        + lambdas["lambda_mag_weighted"] * g_mag_weighted
        + lambdas["lambda_vgg_perceptual"] * g_vgg_p
        + lambdas["lambda_vgg_style"] * g_vgg_s
    )
    return {
        "g_total": g_total,
        "g_adv": g_adv,
        "g_l1_valid": g_l1_valid,
        "g_l1_hole": g_l1_hole,
        "g_mag_weighted": g_mag_weighted,
        "g_vgg_perceptual": g_vgg_p,
        "g_vgg_style": g_vgg_s,
    }


def discriminator_loss(
    d_real_logits: jnp.ndarray, d_fake_logits: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """PatchGAN discriminator BCE (``models/GAN/train.py:347-363``):
    average of real-vs-1 and fake-vs-0."""
    d_real = bce_with_logits(d_real_logits, jnp.ones_like(d_real_logits))
    d_fake = bce_with_logits(d_fake_logits, jnp.zeros_like(d_fake_logits))
    return {"d_total": 0.5 * (d_real + d_fake), "d_real": d_real, "d_fake": d_fake}
