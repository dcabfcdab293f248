"""On-device feature extraction: waveform batches -> model batches.

This is where the reference's DataLoader-worker DSP
(``models/GAN/dataset.py:63-166``, ``models/CNNBLSTM/dataset.py:74-121``)
lands in the TPU design: a pure jittable function from ``(B, S)`` waveforms
and a PRNG key to spectrograms/masks, executed on device as part of the
train step.  Sampling G gap variants per clip (the CNNBLSTM
``gaps_per_audio=25`` recipe) is a ``vmap`` over keys -- the audio is neither
re-read nor re-FFT'd per variant: the clean STFT is computed once per clip
and broadcast.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ml_audio_inpainting_tpu.ops import gaps as gap_ops
from ml_audio_inpainting_tpu.ops import masking
from ml_audio_inpainting_tpu.ops.stft import stft
from ml_audio_inpainting_tpu.utils.config import SpectrogramConfig

__all__ = ["gan_features", "cnn_features"]


def _one_gap(key, n_samples: int, gap_len_s: float, sample_rate: int):
    mask, (s, e) = gap_ops.random_gap_mask(key, n_samples, gap_len_s, sample_rate)
    return mask, s, e


@functools.partial(
    jax.jit,
    static_argnames=("spec", "gap_len_s", "sample_rate", "n_samples", "n_gaps"),
)
def gan_features(
    audio: jnp.ndarray,
    key: jax.Array,
    spec: SpectrogramConfig,
    gap_len_s: float = 0.2,
    sample_rate: int = 16000,
    n_samples: int = 80000,
    n_gaps: int = 1,
) -> Dict[str, jnp.ndarray]:
    """GAN-profile batch features (reference ``models/GAN/dataset.py:63-166``).

    ``n_gaps > 1`` switches to spacing-constrained multi-gap corruption
    (IRMAS_gaps.m-style; an enhancement over the reference's single random
    gap) -- frame masks are the AND of the per-gap floor/ceil masks.

    Returns (all ``(B, F, N)``):
      original_magnitude  log1p(|STFT(clean)|)
      impaired_magnitude  log1p(|STFT(clean * mask)|)
      mask                frame mask, 1 = valid / 0 = hole (floor/ceil rule)
      original_phase      angle(STFT(clean))
    """
    B = audio.shape[0]
    keys = jax.random.split(key, B)
    if n_gaps > 1:
        from ml_audio_inpainting_tpu.data.multigap import multi_gap_mask

        masks, starts_k, lens_k = jax.vmap(
            lambda k: multi_gap_mask(
                k, n_samples, n_gaps,
                max_gap_ms=gap_len_s * 1000.0, sample_rate=sample_rate,
            )
        )(keys)
        starts, ends = starts_k, starts_k + lens_k  # (B, n_gaps)
    else:
        masks, starts, ends = jax.vmap(
            lambda k: _one_gap(k, n_samples, gap_len_s, sample_rate)
        )(keys)

    spec_clean = stft(
        audio, n_fft=spec.n_fft, hop_length=spec.hop_length, win_length=spec.win_length
    )
    spec_gap = stft(
        audio * masks,
        n_fft=spec.n_fft,
        hop_length=spec.hop_length,
        win_length=spec.win_length,
    )
    n_freq, n_time = spec_clean.shape[-2:]
    if n_gaps > 1:
        per_gap = jax.vmap(  # over gaps within a clip
            lambda s, e: gap_ops.frame_mask_from_interval(
                s, e, n_freq, n_time, spec.hop_length
            )
        )
        frame_masks = jax.vmap(lambda ss, ee: jnp.min(per_gap(ss, ee), axis=0))(
            starts, ends
        )
    else:
        frame_masks = jax.vmap(
            lambda s, e: gap_ops.frame_mask_from_interval(
                s, e, n_freq, n_time, spec.hop_length
            )
        )(starts, ends)

    return {
        "original_magnitude": masking.log1p_norm(jnp.abs(spec_clean)),
        "impaired_magnitude": masking.log1p_norm(jnp.abs(spec_gap)),
        "mask": frame_masks,
        "original_phase": jnp.angle(spec_clean),
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "gap_len_s", "sample_rate", "n_samples", "gaps_per_audio", "n_gaps"
    ),
)
def cnn_features(
    audio: jnp.ndarray,
    key: jax.Array,
    spec: SpectrogramConfig,
    gap_len_s: float = 0.2,
    sample_rate: int = 16000,
    n_samples: int = 80000,
    gaps_per_audio: int = 1,
    n_gaps: int = 1,
) -> Dict[str, jnp.ndarray]:
    """CNNBLSTM-profile batch features (``models/CNNBLSTM/dataset.py:74-121``).

    Each of B clips is expanded into G independently-gapped variants
    (``gaps_per_audio``); ``n_gaps > 1`` makes each variant carry that many
    spacing-constrained gaps (IRMAS-style training corruption).  Returns:
      log_gap      (B*G, F, N)  log10(|STFT(gapped)| + 1e-9)
      gap_mask     (B*G, F, N)  1 = gap / 0 = valid (CNNBLSTM convention;
                                frame rule: floor at both ends, matching
                                ``librosa.time_to_frames`` at dataset.py:116-117)
      target_mag   (B*G, F, N)  |STFT(clean)| (linear domain)
      target_phase (B*G, F, N)  angle(STFT(clean))
    """
    B = audio.shape[0]
    G = gaps_per_audio
    keys = jax.random.split(key, B * G).reshape(B, G, -1)

    # Clean STFT once per clip, broadcast to all gap variants.
    spec_clean = stft(
        audio, n_fft=spec.n_fft, hop_length=spec.hop_length, win_length=spec.win_length
    )
    n_freq, n_time = spec_clean.shape[-2:]

    def per_variant(clip, k):
        if n_gaps > 1:
            from ml_audio_inpainting_tpu.data.multigap import multi_gap_mask
            from ml_audio_inpainting_tpu.ops.gaps import frame_mask_from_sample_mask

            mask, _, _ = multi_gap_mask(
                k, n_samples, n_gaps,
                max_gap_ms=gap_len_s * 1000.0, sample_rate=sample_rate,
            )
            # floor/floor rule generalized to arbitrary masks ("end").
            gmask = 1.0 - frame_mask_from_sample_mask(
                mask, n_freq, n_time, spec.hop_length, rule="end"
            )
        else:
            mask, s, e = _one_gap(k, n_samples, gap_len_s, sample_rate)
            # CNNBLSTM frame rule: floor(start/hop) .. floor(end/hop), 1 = gap.
            t = jnp.arange(n_time)
            hole = (t >= s // spec.hop_length) & (t < e // spec.hop_length)
            gmask = jnp.broadcast_to(
                jnp.where(hole, 1.0, 0.0)[None, :], (n_freq, n_time)
            )
        spec_gap = stft(
            clip * mask,
            n_fft=spec.n_fft,
            hop_length=spec.hop_length,
            win_length=spec.win_length,
        )
        return masking.log10_norm(jnp.abs(spec_gap)), gmask

    log_gap, gmask = jax.vmap(
        lambda clip, ks: jax.vmap(lambda k: per_variant(clip, k))(ks)
    )(audio, keys)

    target_mag = jnp.repeat(jnp.abs(spec_clean), G, axis=0)
    target_phase = jnp.repeat(jnp.angle(spec_clean), G, axis=0)
    return {
        "log_gap": log_gap.reshape(B * G, n_freq, n_time),
        "gap_mask": gmask.reshape(B * G, n_freq, n_time),
        "target_mag": target_mag,
        "target_phase": target_phase,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "gap_len_s", "sample_rate", "n_samples", "gaps_per_audio",
        "anchored",
    ),
)
def cnn_phase_features(
    audio: jnp.ndarray,
    key: jax.Array,
    spec: SpectrogramConfig,
    gap_len_s: float = 0.2,
    sample_rate: int = 16000,
    n_samples: int = 80000,
    gaps_per_audio: int = 1,
    anchored: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Phase-mode features: stacked (real, imag) channels of the raw
    (un-normalized) complex STFT (reference
    ``models/CNNBLSTM/old/dataloader_phase.py:88-97``).

    ``anchored=True`` is the round-5 fix for the measured complex-L1
    collapse (``results/cnn_phase_r5_eval.json``): under plain complex L1
    the gap phase is nearly uniform given the input, so the loss-optimal
    point estimate is ~0 and the model learns to predict silence.  The
    anchored variant rotates the TARGET by the phase-vocoder extrapolation
    of the gap phase (``ops/phase.extrapolate_phase``, the same deployable
    estimator the magnitude models use at serving):
    ``target_rot = STFT(clean) * exp(-i * phi_anchor)``.  In the rotated
    frame a correct anchor maps the target onto the positive real axis, so
    the conditional distribution concentrates and L1 regression is
    well-posed; the model now learns magnitude AND a phase *correction*
    relative to a deployable estimate (inference multiplies the prediction
    back by ``exp(+i * phi_anchor)`` -- ``make_cnn_phase_inpaint_fn``).
    The anchor is computed from the GAPPED waveform's STFT restricted to
    window-clear frames (``window_clear_frame_mask``) exactly as at
    serving: no oracle anywhere, train/test identical.

    Returns:
      spec_gap    (B*G, F, N, 2)  real/imag of STFT(gapped)
      gap_mask    (B*G, F, N)     1 = gap
      target      (B*G, F, N)     complex STFT(clean), anchor-rotated when
                  ``anchored`` (identical outside the gap frames only up to
                  the anchor's pass-through: valid frames keep phi_anchor =
                  measured phase there, so rotation cancels in the loss,
                  which is gap-masked anyway)
    """
    from ml_audio_inpainting_tpu.ops.phase import (
        extrapolate_phase,
        window_clear_frame_mask,
    )

    B = audio.shape[0]
    G = gaps_per_audio
    keys = jax.random.split(key, B * G).reshape(B, G, -1)

    spec_clean = stft(
        audio, n_fft=spec.n_fft, hop_length=spec.hop_length, win_length=spec.win_length
    )
    n_freq, n_time = spec_clean.shape[-2:]

    def per_variant(clip, k):
        mask, s, e = _one_gap(k, n_samples, gap_len_s, sample_rate)
        sg = stft(
            clip * mask,
            n_fft=spec.n_fft,
            hop_length=spec.hop_length,
            win_length=spec.win_length,
        )
        t = jnp.arange(n_time)
        hole = (t >= s // spec.hop_length) & (t < e // spec.hop_length)
        gmask = jnp.broadcast_to(jnp.where(hole, 1.0, 0.0)[None, :], (n_freq, n_time))
        return jnp.stack([jnp.real(sg), jnp.imag(sg)], axis=-1), gmask, mask

    spec_gap, gmask, smask = jax.vmap(
        lambda clip, ks: jax.vmap(lambda k: per_variant(clip, k))(ks)
    )(audio, keys)

    spec_gap = spec_gap.reshape(B * G, n_freq, n_time, 2)
    target = jnp.repeat(spec_clean, G, axis=0)
    if anchored:
        # One batched anchor computation over all B*G variants (the
        # associative scans inside extrapolate_phase are natively batched;
        # keeping them out of the nested vmap keeps the traced program
        # small).
        clear = window_clear_frame_mask(
            smask.reshape(B * G, -1), n_time, spec.hop_length, spec.n_fft,
            win_length=spec.win_length,
        )
        phase_gap = jnp.arctan2(spec_gap[..., 1], spec_gap[..., 0])
        phi_a = extrapolate_phase(
            phase_gap, clear, spec.hop_length, spec.n_fft
        )
        target = target * jnp.exp(-1j * phi_a)

    return {
        "spec_gap": spec_gap,
        "gap_mask": gmask.reshape(B * G, n_freq, n_time),
        "target": target,
    }
