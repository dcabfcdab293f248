"""Fused end-to-end inference: gapped waveform -> restored waveform, one jit.

This is the serving path -- the reference's ``models/model_eval.py:48-195``
(``inpaint``) rebuilt as a single XLA program per model family:
gap mask -> STFT -> normalize -> forward -> composite -> iSTFT all on
device, batched over clips, with no host round-trips (BASELINE.json
north-star).

Two fidelity modes for the GAN:

* ``parity``  -- byte-matches the reference pipeline, including its quirk of
  feeding the generator's log1p-domain output directly to the iSTFT as
  magnitude without ``expm1`` or gap compositing
  (``model_eval.py:130-143``).  The reference's reported SDR numbers come
  from this path.
* ``enhanced`` -- de-normalizes (``expm1``) and composites the prediction
  into the gap only, keeping the untouched input elsewhere (the compositing
  rule of SURVEY.md §2.7).  Strictly better output; off by default for
  benchmark parity.

Phase regimes (``phase=``), orthogonal to the modes above:

* ``oracle``     -- the original signal's phase everywhere, INCLUDING inside
  the gap.  This is the reference's own protocol when phase is available
  (``utils.py:316-333``, "reconstruction uses original phase") and the
  historical default, but in a real deployment the gap's phase is lost with
  its samples: numbers under this regime carry a phase oracle.
* ``impaired``   -- the gapped signal's phase (deployable: gap frames carry
  the near-zero-signal phase); output is time-composited so samples outside
  the gap stay untouched (SURVEY.md §2.7 compositing rule).
* ``extrapolate`` -- phase-vocoder extrapolation of the gap phase from the
  per-bin instantaneous frequency measured at the gap boundaries
  (``ops/phase.py``), bidirectional with a cos^2 crossfade; deployable.
* ``griffinlim`` -- momentum Griffin-Lim refinement (``ops/griffinlim``,
  the reference's phase-free path, ``model_eval.py:130-143``) warm-started
  from the extrapolated estimate, then time-composited.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ml_audio_inpainting_tpu.ops import gaps as gap_ops
from ml_audio_inpainting_tpu.ops import masking
from ml_audio_inpainting_tpu.ops.griffinlim import griffinlim
from ml_audio_inpainting_tpu.ops.phase import (
    extrapolate_phase,
    window_clear_frame_mask,
)
from ml_audio_inpainting_tpu.ops.stft import istft, stft
from ml_audio_inpainting_tpu.utils.config import Config
from ml_audio_inpainting_tpu.utils.precision import cast_floating

__all__ = [
    "make_gan_inpaint_fn",
    "make_cnn_inpaint_fn",
    "make_cnn_phase_inpaint_fn",
    "make_gan_inpaint_mask_fn",
    "make_cnn_inpaint_mask_fn",
    "make_tta_shift_fn",
    "make_sharded_serving_fn",
    "route_checkpoint",
]

PHASE_MODES = ("oracle", "impaired", "extrapolate", "griffinlim")

# Gap length past which the standard (<=200 ms-trained) GAN checkpoint yields
# to the long-gap variant: the measured crossover sits between the 0.16 s
# sweep point (standard 2.33 vs longgap 2.18 dB) and 0.32 s (1.13 vs 1.27;
# by 0.5 s it is -1.83 vs +1.20) -- results/gap_length_sweep.json.
LONGGAP_THRESHOLD_S = 0.25


def route_checkpoint(
    gap_len_s: float,
    checkpoint: str | None,
    longgap_checkpoint: str | None,
    threshold_s: float = LONGGAP_THRESHOLD_S,
) -> str | None:
    """Pick standard vs long-gap weights by the gap length being served.

    Operationalizes the measured deployment rule (results/README.md gap-length
    sweep): the standard recipe degrades past ~0.35 s while the
    ``--train-gap-len 0.5`` variant holds; below the threshold the standard
    checkpoint is strictly better.  No reference counterpart -- the reference
    ships a single checkpoint per family and its recorded numbers stop at the
    80 ms condition (``model_eval.py:64-70``).
    """
    if longgap_checkpoint and gap_len_s > threshold_s:
        return longgap_checkpoint
    return checkpoint


def _check_phase(phase: str) -> None:
    if phase not in PHASE_MODES:
        raise ValueError(f"phase must be one of {PHASE_MODES}, got {phase!r}")


def _reconstruct(out_mag, phase_clean, phase_impaired, frame_valid, audio,
                 sample_valid, phase, gl_iters, spec_kw, n_samples):
    """Magnitude -> waveform under the chosen phase regime.

    ``frame_valid``: ``(B, N)`` 1=trustworthy frame (drives the
    phase-vocoder extrapolation).  ``sample_valid`` is the 1=valid
    time-domain mask used for the final time-domain composite in the
    deployable regimes (prediction inside the gap, untouched input
    outside -- SURVEY.md §2.7)."""
    if phase == "oracle":
        return istft(out_mag * jnp.exp(1j * phase_clean), length=n_samples, **spec_kw)
    if phase == "impaired":
        rec = istft(out_mag * jnp.exp(1j * phase_impaired), length=n_samples, **spec_kw)
    else:
        ext = extrapolate_phase(
            phase_impaired, frame_valid, spec_kw["hop_length"], spec_kw["n_fft"]
        )
        if phase == "extrapolate":
            rec = istft(out_mag * jnp.exp(1j * ext), length=n_samples, **spec_kw)
        else:  # griffinlim, warm-started from the extrapolated estimate
            rec = griffinlim(
                out_mag, n_iter=gl_iters, init="given", init_phase=ext,
                length=n_samples, **spec_kw,
            )
    return audio * sample_valid + rec * (1.0 - sample_valid)


def make_gan_inpaint_fn(
    cfg: Config, generator, mode: str = "parity", compute_dtype=None,
    phase: str = "oracle", gl_iters: int = 64,
) -> Callable:
    """Build the jitted GAN inpainting function.

    Returns ``fn(variables, audio, gap_start, gap_len) -> (restored, spec)``
    over ``(B, S)`` clean/gapped waveforms; the gap interval is zeroed
    internally (``model_eval.py:61-73``).

    ``compute_dtype``: optionally run the generator in reduced precision
    (``jnp.bfloat16``) -- DSP stays f32, only the conv stack casts.  Halves
    HBM for activations and roughly doubles MXU throughput.

    ``phase``: the phase regime (module docstring); ``gl_iters`` applies to
    ``phase="griffinlim"`` (reference default 64, ``utils.py:330-333``).
    """
    spec_cfg = cfg.data.spectrogram
    if mode not in ("parity", "enhanced"):
        raise ValueError(f"mode must be 'parity' or 'enhanced', got {mode!r}")
    _check_phase(phase)
    if mode == "parity" and phase != "oracle":
        # parity mode feeds the log1p-domain output straight to the iSTFT
        # (the reference's quirk); Griffin-Lim/extrapolation over a
        # log-domain "magnitude" is meaningless.
        raise ValueError("non-oracle phase regimes require mode='enhanced'")

    @jax.jit
    def fn(variables, audio: jnp.ndarray, gap_start: jnp.ndarray, gap_len: jnp.ndarray):
        n_samples = audio.shape[-1]
        tmask = jax.vmap(
            lambda s, l: gap_ops.gap_mask(n_samples, s, l, dtype=audio.dtype)
        )(gap_start, gap_len)
        impaired = audio * tmask

        spec_clean = stft(
            audio,
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        spec_gap = stft(
            impaired,
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        phase_clean = jnp.angle(spec_clean)
        log_impaired = masking.log1p_norm(jnp.abs(spec_gap))

        F, N = spec_clean.shape[-2:]
        fmask = jax.vmap(
            lambda s, l: gap_ops.frame_mask_from_interval(
                s, s + l, F, N, spec_cfg.hop_length
            )
        )(gap_start, gap_len)

        if compute_dtype is not None:
            cast_vars = cast_floating(variables, compute_dtype)
            generated = generator.apply(
                cast_vars,
                log_impaired.astype(compute_dtype),
                fmask.astype(compute_dtype),
                train=False,
            ).astype(jnp.float32)
        else:
            generated = generator.apply(variables, log_impaired, fmask, train=False)

        if mode == "parity":
            out_mag = generated  # reference feeds log1p-domain output directly
        else:
            # Composite reference magnitude: clean in the oracle regime
            # (the reference's protocol), the GAPPED signal's own STFT in
            # the deployable regimes -- boundary frames of |spec_clean|
            # encode the lost samples (their windows overlap the gap).
            ref_spec = spec_clean if phase == "oracle" else spec_gap
            composited = masking.composite(generated, masking.log1p_norm(jnp.abs(ref_spec)), fmask)
            out_mag = masking.log1p_denorm(composited)

        spec_kw = dict(
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        # Phase-trust mask for the no-oracle regimes: stricter than the
        # model-input frame rule -- a frame's phase is only trustworthy if
        # its whole analysis window avoids the gap (window_clear_frame_mask).
        phase_trust = window_clear_frame_mask(
            tmask, N, spec_cfg.hop_length, spec_cfg.n_fft,
            win_length=spec_cfg.win_length,
        )
        restored = _reconstruct(
            out_mag, phase_clean, jnp.angle(spec_gap), phase_trust,
            audio, tmask, phase, gl_iters, spec_kw, n_samples,
        )
        return restored, generated

    return fn


def make_gan_inpaint_mask_fn(
    cfg: Config, generator, mode: str = "enhanced",
    phase: str = "oracle", gl_iters: int = 64, compute_dtype=None,
) -> Callable:
    """Mask-driven GAN inference: ``fn(variables, audio, sample_mask) ->
    (restored, spec)`` with an ARBITRARY 1=valid time-domain mask -- all
    gaps (IRMAS multi-gap condition) reconstructed in ONE forward pass,
    the frame mask being the exact multi-gap generalization of the
    reference's floor/ceil rule (``frame_mask_from_sample_mask``).

    ``compute_dtype``: same semantics as :func:`make_gan_inpaint_fn` --
    reduced-precision generator conv stack, DSP stays f32."""
    spec_cfg = cfg.data.spectrogram
    if mode not in ("parity", "enhanced"):
        raise ValueError(f"mode must be 'parity' or 'enhanced', got {mode!r}")
    _check_phase(phase)
    if mode == "parity" and phase != "oracle":
        raise ValueError("non-oracle phase regimes require mode='enhanced'")
    phase_mode = phase

    @jax.jit
    def fn(variables, audio: jnp.ndarray, sample_mask: jnp.ndarray):
        n_samples = audio.shape[-1]
        impaired = audio * sample_mask
        kw = dict(
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        spec_clean = stft(audio, **kw)
        spec_gap = stft(impaired, **kw)
        phase_clean = jnp.angle(spec_clean)
        log_impaired = masking.log1p_norm(jnp.abs(spec_gap))
        F, N = spec_clean.shape[-2:]
        fmask = gap_ops.frame_mask_from_sample_mask(
            sample_mask, F, N, spec_cfg.hop_length, rule="any"
        )
        if compute_dtype is not None:
            cast_vars = cast_floating(variables, compute_dtype)
            generated = generator.apply(
                cast_vars,
                log_impaired.astype(compute_dtype),
                fmask.astype(compute_dtype),
                train=False,
            ).astype(jnp.float32)
        else:
            generated = generator.apply(variables, log_impaired, fmask, train=False)
        if mode == "parity":
            out_mag = generated
        else:
            ref_spec = spec_clean if phase_mode == "oracle" else spec_gap
            composited = masking.composite(
                generated, masking.log1p_norm(jnp.abs(ref_spec)), fmask
            )
            out_mag = masking.log1p_denorm(composited)
        phase_trust = window_clear_frame_mask(
            sample_mask, N, spec_cfg.hop_length, spec_cfg.n_fft,
            win_length=spec_cfg.win_length,
        )
        restored = _reconstruct(
            out_mag, phase_clean, jnp.angle(spec_gap), phase_trust,
            audio, sample_mask, phase_mode, gl_iters, kw, n_samples,
        )
        return restored, generated

    return fn


def make_cnn_inpaint_mask_fn(
    cfg: Config, model, phase: str = "oracle", gl_iters: int = 64
) -> Callable:
    """Mask-driven CNNBLSTM inference (multi-gap in one pass); frame rule
    is the exact floor/floor generalization (``rule="end"``)."""
    spec_cfg = cfg.data.spectrogram
    _check_phase(phase)
    phase_mode = phase

    @jax.jit
    def fn(variables, audio: jnp.ndarray, sample_mask: jnp.ndarray):
        n_samples = audio.shape[-1]
        kw = dict(
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        spec_clean = stft(audio, **kw)
        phase_clean = jnp.angle(spec_clean)
        F, N = spec_clean.shape[-2:]
        valid = gap_ops.frame_mask_from_sample_mask(
            sample_mask, F, N, spec_cfg.hop_length, rule="end"
        )
        gmask = 1.0 - valid  # CNNBLSTM convention: 1 = gap
        # Oracle regime: the reference's protocol -- gap applied by
        # frame-zeroing the CLEAN STFT (model_eval.py:146-150).  Deployable
        # regimes: the whole pipeline (model input, composite, phase) runs
        # off the actually-gapped waveform -- boundary frames of the clean
        # STFT (magnitude AND phase) are derived from the lost samples.
        # XLA dead-code-eliminates whichever branch is unused.
        spec_gap = stft(audio * sample_mask, **kw)
        base = spec_clean if phase_mode == "oracle" else spec_gap
        log_impaired = jnp.log10(
            jnp.abs(base) * (1.0 - gmask) + masking.LOG10_EPS
        )
        pred = model.apply(variables, log_impaired, train=False)
        composited = pred * gmask + log_impaired * (1.0 - gmask)
        out_mag = masking.log10_denorm(composited)
        phase_impaired = jnp.angle(spec_gap)
        phase_trust = window_clear_frame_mask(
            sample_mask, N, spec_cfg.hop_length, spec_cfg.n_fft,
            win_length=spec_cfg.win_length,
        )
        restored = _reconstruct(
            out_mag, phase_clean, phase_impaired, phase_trust, audio,
            sample_mask, phase_mode, gl_iters, kw, n_samples,
        )
        return restored, composited

    return fn


def make_cnn_phase_inpaint_fn(cfg: Config, model, anchored: bool = False) -> Callable:
    """Jitted inference for the phase-mode (complex 2-channel) CNNBLSTM.

    The model consumes stacked (real, imag) channels of the gapped
    waveform's raw STFT and predicts the COMPLEX spectrogram -- magnitude
    AND phase -- so this path needs no phase regime: it is deployable by
    construction (no oracle anywhere; the entire pipeline runs off the
    gapped waveform).  The reference trained this pipeline in
    ``models/CNNBLSTM/old/train_v2_phase.py:87-92`` /
    ``old/dataloader_phase.py:88-97`` but shipped no eval path for it;
    this is its serving counterpart, with the standard compositing
    contract (predicted complex frames inside the gap, the input's frames
    elsewhere; final time-domain composite keeps every sample outside the
    gap untouched).

    ``anchored``: serve a checkpoint trained with the anchor-rotated target
    (``train/features.cnn_phase_features(anchored=True)``, the round-5 fix
    for the complex-L1 median collapse): the model's output lives in the
    frame rotated by the phase-vocoder anchor, so multiply it back by
    ``exp(+i * phi_anchor)`` before compositing.  The anchor here is
    computed exactly as in training -- from the gapped waveform's STFT on
    window-clear frames -- still no oracle anywhere.
    """
    spec_cfg = cfg.data.spectrogram

    @jax.jit
    def fn(variables, audio: jnp.ndarray, gap_start: jnp.ndarray, gap_len: jnp.ndarray):
        n_samples = audio.shape[-1]
        tmask = jax.vmap(
            lambda s, l: gap_ops.gap_mask(n_samples, s, l, dtype=audio.dtype)
        )(gap_start, gap_len)
        kw = dict(
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        spec_gap = stft(audio * tmask, **kw)
        F, N = spec_gap.shape[-2:]

        # CNNBLSTM frame rule: floor at both ends, 1 = gap (the training
        # features' rule, train/features.cnn_phase_features).
        def frame_gap_mask(s, l):
            t = jnp.arange(N)
            hole = (t >= s // spec_cfg.hop_length) & (t < (s + l) // spec_cfg.hop_length)
            return jnp.broadcast_to(jnp.where(hole, 1.0, 0.0)[None, :], (F, N))

        gmask = jax.vmap(frame_gap_mask)(gap_start, gap_len)
        x = jnp.stack([jnp.real(spec_gap), jnp.imag(spec_gap)], axis=-1)
        pred = model.apply(variables, x, train=False)  # (B, F, T, 2)
        pred_c = pred[..., 0] + 1j * pred[..., 1]
        if anchored:
            clear = window_clear_frame_mask(
                tmask, N, spec_cfg.hop_length, spec_cfg.n_fft,
                win_length=spec_cfg.win_length,
            )
            phi_a = extrapolate_phase(
                jnp.angle(spec_gap), clear, spec_cfg.hop_length, spec_cfg.n_fft
            )
            pred_c = pred_c * jnp.exp(1j * phi_a)
        composited = pred_c * gmask + spec_gap * (1.0 - gmask)
        rec = istft(composited, length=n_samples, **kw)
        restored = audio * tmask + rec * (1.0 - tmask)
        return restored, composited

    return fn


def make_tta_shift_fn(inpaint_fn, hop_length: int, n_shifts: int) -> Callable:
    """Test-time sub-hop shift ensemble around a ``(variables, audio,
    gap_start, gap_len)`` inpaint function.

    The STFT grid is only shift-invariant modulo ``hop_length``: translating
    the waveform by ``s < hop`` samples presents the model with a genuinely
    different framing of the same gap.  This wrapper inpaints ``n_shifts``
    evenly spaced sub-hop translations, undoes each shift, and averages the
    predictions INSIDE the gap (outside it the composite keeps the untouched
    input, so averaging is a no-op there by construction and we re-composite
    explicitly to keep that exact).  One jit over the whole ensemble; the
    shifted copies run as a single unrolled program so XLA shares the DSP
    prologue.  No reference counterpart (``model_eval.py`` runs one
    alignment); this is a serving-time quality knob with no training cost.

    ``jnp.roll`` wrap-around touches only the first/last ``s < hop`` samples
    of each shifted copy -- those frames sit at the clip boundary, far from
    any interior gap, and the final composite restores the original samples
    everywhere outside the gap regardless.
    """
    if n_shifts < 1:
        raise ValueError(f"n_shifts must be >= 1, got {n_shifts}")
    shifts = [int(round(i * hop_length / n_shifts)) for i in range(n_shifts)]

    @jax.jit
    def fn(variables, audio: jnp.ndarray, gap_start: jnp.ndarray, gap_len: jnp.ndarray):
        n_samples = audio.shape[-1]
        acc = None
        aux0 = None
        for s in shifts:
            shifted = jnp.roll(audio, -s, axis=-1)
            out, aux = inpaint_fn(variables, shifted, gap_start - s, gap_len)
            out = jnp.roll(out, s, axis=-1)
            acc = out if acc is None else acc + out
            if aux0 is None:
                aux0 = aux
        avg = acc / float(len(shifts))
        tmask = jax.vmap(
            lambda s, l: gap_ops.gap_mask(n_samples, s, l, dtype=audio.dtype)
        )(gap_start, gap_len)
        return audio * tmask + avg * (1.0 - tmask), aux0

    return fn


def make_cnn_inpaint_fn(
    cfg: Config, model, phase: str = "oracle", gl_iters: int = 64
) -> Callable:
    """Build the jitted CNNBLSTM inpainting function
    (``model_eval.py:144-192``).

    Gap is applied in the spectrogram domain (frame mask via the floor rule
    of ``librosa.time_to_frames``); output is ``10 ** (pred in gap, input
    elsewhere)`` reconstructed with the input phase.
    """
    spec_cfg = cfg.data.spectrogram
    _check_phase(phase)
    phase_mode = phase

    @jax.jit
    def fn(variables, audio: jnp.ndarray, gap_start: jnp.ndarray, gap_len: jnp.ndarray):
        n_samples = audio.shape[-1]
        spec_clean = stft(
            audio,
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        phase_clean = jnp.angle(spec_clean)
        F, N = spec_clean.shape[-2:]

        # CNNBLSTM frame rule: floor at both ends, 1 = gap (model_eval.py:146-150)
        def frame_gap_mask(s, l):
            t = jnp.arange(N)
            hole = (t >= s // spec_cfg.hop_length) & (t < (s + l) // spec_cfg.hop_length)
            return jnp.broadcast_to(jnp.where(hole, 1.0, 0.0)[None, :], (F, N))

        gmask = jax.vmap(frame_gap_mask)(gap_start, gap_len)
        tmask = jax.vmap(
            lambda s, l: gap_ops.gap_mask(n_samples, s, l, dtype=audio.dtype)
        )(gap_start, gap_len)
        kw = dict(
            n_fft=spec_cfg.n_fft,
            hop_length=spec_cfg.hop_length,
            win_length=spec_cfg.win_length,
        )
        # Oracle: reference protocol (frame-zeroed clean STFT); deployable:
        # everything from the gapped waveform (see make_cnn_inpaint_mask_fn).
        spec_gap = stft(audio * tmask, **kw)
        base = spec_clean if phase_mode == "oracle" else spec_gap
        log_impaired = jnp.log10(jnp.abs(base) * (1.0 - gmask) + masking.LOG10_EPS)

        pred = model.apply(variables, log_impaired, train=False)
        composited = pred * gmask + log_impaired * (1.0 - gmask)
        out_mag = masking.log10_denorm(composited)
        phase_impaired = jnp.angle(spec_gap)
        phase_trust = window_clear_frame_mask(
            tmask, N, spec_cfg.hop_length, spec_cfg.n_fft,
            win_length=spec_cfg.win_length,
        )
        restored = _reconstruct(
            out_mag, phase_clean, phase_impaired, phase_trust, audio,
            tmask, phase_mode, gl_iters, kw, n_samples,
        )
        return restored, composited

    return fn


def make_sharded_serving_fn(inpaint_fn: Callable, mesh) -> Callable:
    """Scale any jitted inpaint fn to data-parallel serving over a mesh.

    The returned callable has the same ``(variables, audio, gap_start,
    gap_len)`` signature; it replicates the weights and shards the batch
    (leading axis) over the mesh's ``data`` axis, so the jitted program XLA
    emits is a DP partition of the single-device graph — identical math on
    each shard, no collectives on the forward path (inpainting has no
    cross-example coupling). The global batch must be divisible by the
    ``data`` axis size.

    The reference serves single-device only (``model_eval.py:48-195``,
    ``cuda if available``); this is the serving-side counterpart of the
    DP×TP training sharding proven in ``tests/test_parallel.py`` /
    ``__graft_entry__.dryrun_multichip``.
    """
    from ml_audio_inpainting_tpu.parallel.mesh import batch_sharding, replicated

    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def fn(variables, audio, gap_start, gap_len):
        n_data = mesh.shape["data"]
        if audio.shape[0] % n_data != 0:
            raise ValueError(
                f"batch {audio.shape[0]} not divisible by data axis {n_data}"
            )
        variables = jax.device_put(variables, rep)
        audio = jax.device_put(audio, bs)
        gap_start = jax.device_put(gap_start, bs)
        gap_len = jax.device_put(gap_len, bs)
        return inpaint_fn(variables, audio, gap_start, gap_len)

    return fn
