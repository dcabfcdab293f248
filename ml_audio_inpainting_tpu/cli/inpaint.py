"""Inference CLI: inpaint FLAC/WAV files with any model family.

The reference's cross-model driver is ``models/model_eval.py`` (hardcoded
paths, edit-to-configure).  This exposes it properly::

    mai-inpaint --model gan --checkpoint ckpt_dir --input in.flac --output out.flac
    mai-inpaint --model janssen --input dir/ --output outdir/ --gap-start 2.0 --gap-len 0.08

Model families: ``gan``, ``cnn_blstm`` (checkpointed networks), and the
classical solvers ``janssen``, ``arinpaint``, ``segmentation``, ``aspain``,
``sspain``, ``sspain_omp`` (no checkpoint needed).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

CLASSICAL = (
    "janssen", "arinpaint", "segmentation", "aspain", "sspain", "sspain_omp",
    "aspain_learned", "sspain_learned",
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Inpaint gapped audio")
    p.add_argument("--model", required=True,
                   choices=["gan", "cnn_blstm", "cnn_phase",
                            "cnn_phase_anchored", "refiner", *CLASSICAL])
    p.add_argument("--gan-checkpoint", type=str,
                   default="results/checkpoints/gan_formant_v2_r2.npz",
                   help="GAN weights npz for --model refiner (the head rides "
                        "on the frozen deployable GAN path)")
    p.add_argument("--gan-config", type=str, default=None,
                   help="GAN YAML for --model refiner (default: GAN profile)")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None, help="orbax checkpoint dir")
    p.add_argument("--checkpoint-longgap", type=str, default=None,
                   help="long-gap variant weights (e.g. "
                        "results/checkpoints/gan_formant_v2_longgap_r2.npz); "
                        "used instead of --checkpoint when --gap-len exceeds "
                        "--longgap-threshold (the measured crossover, "
                        "results/gap_length_sweep.json)")
    p.add_argument("--longgap-threshold", type=float, default=None,
                   help="gap length (s) past which --checkpoint-longgap "
                        "takes over (default: the measured 0.25 s crossover)")
    p.add_argument("--input", required=True, help="audio file or directory")
    p.add_argument("--output", required=True, help="output file or directory")
    p.add_argument("--gap-start", type=float, default=2.0, help="gap start (s); model_eval.py:70")
    p.add_argument("--gap-len", type=float, default=0.08, help="gap length (s); model_eval.py:64")
    p.add_argument("--mode", choices=["parity", "enhanced"], default="parity")
    p.add_argument("--phase", choices=["oracle", "impaired", "extrapolate", "griffinlim"],
                   default="oracle",
                   help="phase regime for neural reconstruction: the "
                        "reference's original-phase protocol (oracle, "
                        "utils.py:316-333), the gapped signal's phase "
                        "(deployable), or Griffin-Lim refinement warm-started "
                        "from it (deployable, model_eval.py:130-143)")
    p.add_argument("--infer-dtype", choices=["f32", "bf16"], default="f32",
                   help="GAN generator compute precision for serving: bf16 "
                        "halves activation HBM (fits B=64 single-chip) at "
                        "~0.1%% relative output deviation; DSP stays f32")
    p.add_argument("--gl-iters", type=int, default=64,
                   help="Griffin-Lim iterations for --phase griffinlim "
                        "(reference default 64, utils.py:330-333)")
    p.add_argument("--tta-shifts", type=int, default=1,
                   help="test-time sub-hop shift ensemble for the neural "
                        "models: inpaint N evenly spaced waveform "
                        "translations (< one STFT hop) and average the "
                        "predictions inside the gap (1 = off). Costs N "
                        "forward passes per clip")
    p.add_argument("--ar-order", type=int, default=512)
    p.add_argument("--ar-context", type=int, default=4096,
                   help="AR fit context samples per side (arinpaint.m's "
                        "maxlen; 8192 measured best on the real-clip probe "
                        "set, results/ar_context_sweep.json)")
    p.add_argument("--ar-blend", choices=["cos2", "linear", "sigmoid"],
                   default="cos2",
                   help="fwd/bwd crossfade curve for arinpaint (cos2 = "
                        "reference parity; a gentle ramp measured best on "
                        "the probe set, results/ar_blend_sweep.json)")
    p.add_argument("--ar-blend-param", type=float, default=0.0,
                   help="blend parameter: floor c for linear, steepness k "
                        "for sigmoid (0 = family default)")
    p.add_argument("--maxit", type=int, default=10)
    p.add_argument("--ar-preset", choices=["default", "tuned"],
                   default="default",
                   help="'tuned' deploys the measured per-gap-length "
                        "champion configs for the classical solvers "
                        "(classical/presets.py: 40 ms +3.42 dB vs defaults' "
                        "+3.13, 80 ms +2.84 vs +2.55; >=160 ms keeps the "
                        "defaults -- results/ar_tuned_per_length.json). "
                        "Overrides the individual --ar-* flags")
    p.add_argument("--ar-method", choices=["lpc", "arburg"], default="lpc")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--basis", type=str, default=None,
                   help="npz file with a unitary 'basis' matrix for the "
                        "learned-SPAIN solvers (identity when omitted)")
    p.add_argument("--longform", action="store_true",
                   help="inpaint audio of any duration (neural models): "
                        "overlapping model-native windows + OLA "
                        "(runtime/longform.py); the gap may be anywhere")
    return p


def _collect(inp: Path) -> List[Path]:
    if inp.is_dir():
        return sorted(
            p for p in inp.rglob("*") if p.suffix.lower() in (".flac", ".wav", ".mp3")
        )
    return [inp]


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.data.audio_io import load_audio, save_audio
    from ml_audio_inpainting_tpu.utils.config import Config, load_config

    args = build_argparser().parse_args(argv)
    if args.model == "gan":
        from ml_audio_inpainting_tpu.utils.config import gan_profile_config

        cfg = gan_profile_config(args.config)
    else:
        cfg = load_config(args.config) if args.config else Config()

    sr = cfg.data.sample_rate
    files = _collect(Path(args.input))
    out_path = Path(args.output)
    out_is_dir = out_path.is_dir() or len(files) > 1
    if out_is_dir:
        out_path.mkdir(parents=True, exist_ok=True)

    gap_start = int(args.gap_start * sr)
    gap_len = int(args.gap_len * sr)
    if args.checkpoint_longgap:
        from ml_audio_inpainting_tpu.runtime.inference import (
            LONGGAP_THRESHOLD_S,
            route_checkpoint,
        )

        routed = route_checkpoint(
            args.gap_len, args.checkpoint, args.checkpoint_longgap,
            args.longgap_threshold
            if args.longgap_threshold is not None else LONGGAP_THRESHOLD_S,
        )
        if routed != args.checkpoint:
            print(f"gap {args.gap_len:.3f}s: routing to long-gap checkpoint {routed}")
        args.checkpoint = routed
    if args.model == "refiner":
        from ml_audio_inpainting_tpu.train.refiner_trainer import MAX_GAP

        if gap_len > MAX_GAP:
            raise SystemExit(
                f"--model refiner supports gaps up to {MAX_GAP} samples "
                f"({MAX_GAP / sr * 1000:.0f} ms); got {gap_len}. Longer "
                "gaps would be silently zero-filled past the head's window "
                "-- use arinpaint/janssen or the longgap GAN instead."
            )
    n_samples = cfg.data.max_samples

    run_fn = _build_runner(args, cfg, n_samples)

    if args.longform:
        if not hasattr(run_fn, "inpaint_fn"):
            raise SystemExit("--longform requires a neural model (gan/cnn_blstm)")
        from ml_audio_inpainting_tpu.data.audio_io import read_audio, resample
        from ml_audio_inpainting_tpu.runtime.longform import longform_inpaint

        for f in files:
            samples, rate, _ = read_audio(f)
            mono = samples.mean(axis=1) if samples.shape[1] > 1 else samples[:, 0]
            mono = resample(mono.astype(np.float32), rate, sr)
            restored = np.asarray(
                longform_inpaint(
                    run_fn.inpaint_fn, run_fn.variables, jnp.asarray(mono),
                    gap_start, gap_len,
                    window=n_samples, hop=n_samples // 2,
                    batch_size=args.batch_size,
                )
            )
            dest = (
                out_path / f"{f.stem}_{args.model}_inpainted.flac"
                if out_is_dir else out_path
            )
            save_audio(restored, dest, sr)
            print(f"{f} ({len(mono)/sr:.1f}s) -> {dest}")
        return

    for i in range(0, len(files), args.batch_size):
        chunk = files[i : i + args.batch_size]
        audio = np.stack(
            [load_audio(f, sample_rate=sr, max_len=cfg.data.max_len_s)[0] for f in chunk]
        )
        restored = run_fn(
            jnp.asarray(audio),
            jnp.full((len(chunk),), gap_start, jnp.int32),
            jnp.full((len(chunk),), gap_len, jnp.int32),
        )
        restored = np.asarray(restored)
        for j, f in enumerate(chunk):
            if out_is_dir:
                dest = out_path / f"{f.stem}_{args.model}_inpainted.flac"
            else:
                dest = out_path
            save_audio(restored[j], dest, sr)
            print(f"{f} -> {dest}")


def _build_runner(args, cfg, n_samples: int):
    """Returns fn(audio (B,S), gap_start (B,), gap_len (B,)) -> (B,S)."""
    from ml_audio_inpainting_tpu.ops.gaps import gap_mask

    if getattr(args, "ar_preset", "default") == "tuned":
        # Apply the measured per-condition champion configs
        # (classical/presets.py; results/ar_tuned_per_length.json).  Only
        # the classical solvers have measured presets; explicit CLI values
        # are overridden (the preset IS the measured selection).
        from ml_audio_inpainting_tpu.classical.presets import (
            tuned_arinpaint_preset,
            tuned_janssen_preset,
        )

        picker = {
            "arinpaint": tuned_arinpaint_preset,
            "janssen": tuned_janssen_preset,
        }.get(args.model)
        if picker is not None:
            overrides = picker(float(args.gap_len))
            if overrides:
                # argparse cannot distinguish explicit flags from defaults
                # here, so the preset wins over any manually passed
                # --ar-order/--ar-context/--ar-blend/--maxit; say which
                # values it applied so an overridden flag is visible in the
                # run log (round-3 advisor finding).
                print(
                    f"--ar-preset tuned ({args.model}, gap {float(args.gap_len):.3f}s): "
                    "applying measured overrides "
                    + ", ".join(f"{k}={v}" for k, v in overrides.items()),
                    file=sys.stderr,
                )
            for k, v in overrides.items():
                setattr(args, k, v)

    if getattr(args, "infer_dtype", "f32") == "bf16" and args.model != "gan":
        # bf16 serving is wired for the conv-heavy GAN generator; the other
        # models are either latency-bound (CNN scan) or numerically
        # sensitive (classical solvers need `highest` matmul precision).
        raise SystemExit("--infer-dtype bf16 is supported for --model gan only")

    if args.model == "refiner":
        # Deployable hybrid: frozen GAN (extrapolated phase) + AR fill ->
        # learned time-domain correction (models/refiner.py; VERDICT r2 #1).
        from ml_audio_inpainting_tpu.train.checkpoints import load_params_npz
        from ml_audio_inpainting_tpu.train.gan_trainer import build_generator
        from ml_audio_inpainting_tpu.train.refiner_trainer import (
            make_refiner_apply_fn,
        )
        from ml_audio_inpainting_tpu.utils.config import gan_profile_config

        gcfg = gan_profile_config(getattr(args, "gan_config", None))
        gan = build_generator(gcfg)
        gan_ckpt = Path(args.gan_checkpoint)
        if not gan_ckpt.exists():
            # default is repo-relative; resolve it when invoked elsewhere
            gan_ckpt = Path(__file__).resolve().parents[2] / args.gan_checkpoint
        gan_vars = load_params_npz(gan_ckpt)
        if not args.checkpoint:
            raise SystemExit("--model refiner requires --checkpoint (head npz)")
        from ml_audio_inpainting_tpu.train.refiner_trainer import (
            refiner_channels,
        )

        rvars = load_params_npz(args.checkpoint)
        fn = make_refiner_apply_fn(
            gcfg, gan, gan_vars, channels=refiner_channels(rvars)
        )

        def runner(audio, gs, gl):
            return fn(rvars, audio, gs, gl)

        return runner

    if args.model in ("gan", "cnn_blstm", "cnn_phase", "cnn_phase_anchored"):
        from ml_audio_inpainting_tpu.runtime.inference import (
            make_cnn_inpaint_fn,
            make_cnn_phase_inpaint_fn,
            make_gan_inpaint_fn,
        )
        from ml_audio_inpainting_tpu.train.checkpoints import CheckpointManager

        if args.model == "gan":
            # The GAN checkpoints use the GAN STFT profile; a default
            # (CNN-profile) cfg silently mis-scores them (the round-3
            # gate-test footgun) -- assert the profile when no YAML given.
            if args.config is None:
                from ml_audio_inpainting_tpu.utils.config import (
                    gan_profile_config,
                )

                cfg = gan_profile_config(None)
            from ml_audio_inpainting_tpu.train.gan_trainer import (
                build_generator,
                create_gan_states,
            )

            model = build_generator(cfg)
            if args.checkpoint and str(args.checkpoint).endswith(".npz"):
                # Compact exported generator weights (export_params_npz).
                from ml_audio_inpainting_tpu.train.checkpoints import (
                    load_params_npz,
                )

                variables = load_params_npz(args.checkpoint)
            else:
                g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0))
                if args.checkpoint:
                    mgr = CheckpointManager(args.checkpoint)
                    restored = mgr.restore({"g": g_state, "d": d_state})
                    g_state = restored["g"]
                variables = {"params": g_state.params}
                if g_state.batch_stats is not None:
                    variables["batch_stats"] = g_state.batch_stats
            compute_dtype = (
                jnp.bfloat16
                if getattr(args, "infer_dtype", "f32") == "bf16"
                else None
            )
            fn = make_gan_inpaint_fn(cfg, model, mode=args.mode,
                                     compute_dtype=compute_dtype,
                                     phase=args.phase, gl_iters=args.gl_iters)
        else:
            from ml_audio_inpainting_tpu.train.cnn_trainer import (
                build_model,
                create_cnn_state,
            )

            if args.model in ("cnn_phase", "cnn_phase_anchored"):
                # Complex 2-channel pipeline: model predicts magnitude AND
                # phase, so no --phase regime applies (deployable by
                # construction).  Reference trained but never served this
                # (old/train_v2_phase.py); no torch checkpoint exists.
                cfg.model.cnn_blstm.in_channels = 2
                if args.checkpoint and str(args.checkpoint).endswith((".pt", ".pth")):
                    raise SystemExit(
                        "--model cnn_phase has no torch checkpoint port "
                        "(the reference shipped none); use an npz or orbax dir"
                    )

            if args.checkpoint and str(args.checkpoint).endswith((".pt", ".pth")):
                # Reference torch checkpoints load directly (port_torch.py).
                from ml_audio_inpainting_tpu.models.port_torch import (
                    load_torch_cnn_blstm,
                )

                model, variables = load_torch_cnn_blstm(
                    args.checkpoint, freq_bins=cfg.data.spectrogram.freq_bins
                )
            elif args.checkpoint and str(args.checkpoint).endswith(".npz"):
                # Compact exported weights (checkpoints.export_params_npz).
                from ml_audio_inpainting_tpu.train.checkpoints import (
                    load_params_npz,
                )

                model = build_model(cfg)
                variables = load_params_npz(args.checkpoint)
            else:
                model = build_model(cfg)
                state = create_cnn_state(cfg, jax.random.PRNGKey(0))
                if args.checkpoint:
                    mgr = CheckpointManager(args.checkpoint)
                    state = mgr.restore(state)
                variables = {"params": state.params}
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
            if args.model in ("cnn_phase", "cnn_phase_anchored"):
                fn = make_cnn_phase_inpaint_fn(
                    cfg, model,
                    anchored=(args.model == "cnn_phase_anchored"),
                )
            else:
                fn = make_cnn_inpaint_fn(cfg, model,
                                         phase=args.phase, gl_iters=args.gl_iters)

        if getattr(args, "tta_shifts", 1) > 1:
            from ml_audio_inpainting_tpu.runtime.inference import (
                make_tta_shift_fn,
            )

            fn = make_tta_shift_fn(
                fn, cfg.data.spectrogram.hop_length, args.tta_shifts
            )

        def runner(audio, gs, gl):
            restored, _ = fn(variables, audio, gs, gl)
            return restored

        # Expose the raw pieces for the long-form and multi-gap drivers
        # (cfg carries the profile actually used -- it may differ from the
        # caller's when the GAN default was asserted above).
        runner.inpaint_fn = fn
        runner.variables = variables
        runner.model = model
        runner.cfg = cfg
        return runner

    # Classical solvers: vmap over the batch.
    max_gap = 1 << (int(args.gap_len * cfg.data.sample_rate) - 1).bit_length()

    def masks(audio, gs, gl):
        return jax.vmap(lambda s, l: gap_mask(audio.shape[-1], s, l))(gs, gl)

    if args.model == "janssen":
        from ml_audio_inpainting_tpu.classical.janssen import janssen_gapwise

        def runner(audio, gs, gl):
            m = masks(audio, gs, gl)
            return jax.vmap(
                lambda x, mm, s, l: janssen_gapwise(
                    x * mm, mm, s, l, p=args.ar_order, maxit=args.maxit,
                    method=args.ar_method, max_gap=max_gap,
                    context=args.ar_context,
                )
            )(audio, m, gs, gl)

        return runner
    if args.model == "arinpaint":
        from ml_audio_inpainting_tpu.classical.arinpaint import arinpaint

        def runner(audio, gs, gl):
            m = masks(audio, gs, gl)
            return jax.vmap(
                lambda x, mm, s, l: arinpaint(
                    x * mm, mm, s, l, order=args.ar_order, max_gap=max_gap,
                    context=args.ar_context, method=args.ar_method,
                    blend=args.ar_blend, blend_param=args.ar_blend_param,
                )
            )(audio, m, gs, gl)

        return runner
    if args.model == "segmentation":
        from ml_audio_inpainting_tpu.classical.ola import segmentation_inpaint

        def runner(audio, gs, gl):
            m = masks(audio, gs, gl)
            return jax.vmap(
                lambda x, mm, s, l: segmentation_inpaint(
                    x * mm, mm, s, l, p=args.ar_order, maxit=args.maxit,
                    method=args.ar_method, max_gap=max_gap,
                )
            )(audio, m, gs, gl)

        return runner
    if args.model in ("aspain_learned", "sspain_learned"):
        from ml_audio_inpainting_tpu.classical.basisopt import (
            aspain_learned,
            sspain_learned,
        )

        spec = cfg.data.spectrogram
        if getattr(args, "basis", None):
            basis = jnp.asarray(np.load(args.basis)["basis"], jnp.complex64)
        else:
            basis = jnp.eye(spec.freq_bins, dtype=jnp.complex64)
        core = aspain_learned if args.model == "aspain_learned" else sspain_learned

        def runner(audio, gs, gl):
            m = masks(audio, gs, gl)
            return jax.vmap(
                lambda x, mm: core(
                    x * mm, mm, basis, maxit=max(args.maxit, 100),
                    n_fft=spec.n_fft, hop_length=spec.hop_length,
                    win_length=spec.win_length,
                )
            )(audio, m)

        return runner
    # aspain / sspain
    from ml_audio_inpainting_tpu.classical.spain import spain_inpaint

    def runner(audio, gs, gl):
        m = masks(audio, gs, gl)
        spain_maxit = max(args.maxit, 30 if args.model == "sspain_omp" else 100)
        return jax.vmap(
            lambda x, mm, s, l: spain_inpaint(
                x * mm, mm, s, l, algorithm=args.model, maxit=spain_maxit,
                max_gap=max_gap,
            )
        )(audio, m, gs, gl)

    return runner


if __name__ == "__main__":
    main()
