"""Evaluation CLI: cross-model metric comparison on an eval set.

Replaces the MATLAB comparison pipeline (``models/AudioReg/model_eval.m``):
for each clip, insert the standard eval gap (80 ms @ t=2.0 s,
``model_eval.m:27-36``), inpaint with each requested model, and report
gap-SDR, full-signal SNR, log-spectral distance, and the perceptual proxy
(fwseg-SNR; PEMO-Q/PEAQ substitution documented in BASELINE.md).  Results
go to stdout as a table and optionally to a JSON file
(``model_comparison.mat`` equivalent).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate inpainting models")
    p.add_argument("--models", nargs="+", required=True,
                   help="any of: gan cnn_blstm cnn_phase cnn_phase_anchored "
                        "refiner janssen arinpaint segmentation aspain "
                        "sspain sspain_omp")
    p.add_argument("--gan-checkpoint", type=str,
                   default="results/checkpoints/gan_formant_v2_r2.npz",
                   help="GAN weights npz for the refiner model")
    p.add_argument("--gan-config", type=str, default=None,
                   help="GAN YAML for the refiner model (default: GAN profile)")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--checkpoint-longgap", type=str, default=None,
                   help="long-gap variant weights; used instead of "
                        "--checkpoint when --gap-len exceeds "
                        "--longgap-threshold (measured crossover, "
                        "results/gap_length_sweep.json)")
    p.add_argument("--longgap-threshold", type=float, default=None,
                   help="gap length (s) past which --checkpoint-longgap "
                        "takes over (default: the measured 0.25 s crossover)")
    p.add_argument("--input", type=str, default="/root/reference/test_samples",
                   help="eval clips directory (default: the 9 bundled samples)")
    p.add_argument("--output-json", type=str, default=None)
    p.add_argument("--reconstructions", type=str, default=None,
                   help="also write inpainted FLACs here")
    p.add_argument("--gap-start", type=float, default=2.0)
    p.add_argument("--gap-len", type=float, default=0.08)
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
                        "(classical/presets.py; overrides the --ar-* flags). "
                        "Calibrated on the SINGLE-gap condition: with "
                        "--n-gaps > 1 the preset is picked once from the "
                        "nominal --gap-len (gaps sampled shorter keep it)")
    p.add_argument("--ar-method", choices=["lpc", "arburg"], default="lpc")
    p.add_argument("--mode", choices=["parity", "enhanced"], default="parity")
    p.add_argument("--infer-dtype", choices=["f32", "bf16"], default="f32",
                   help="GAN generator serving precision (see cli/inpaint.py)")
    p.add_argument("--phase", choices=["oracle", "impaired", "extrapolate", "griffinlim"],
                   default="oracle",
                   help="phase regime for neural reconstruction (see "
                        "runtime/inference.py docstring); oracle reproduces "
                        "the historical numbers, impaired/griffinlim are the "
                        "deployable regimes with no phase oracle in the gap")
    p.add_argument("--gl-iters", type=int, default=64)
    p.add_argument("--tta-shifts", type=int, default=1,
                   help="test-time sub-hop shift ensemble for the neural "
                        "models (see cli.inpaint --tta-shifts; 1 = off)")
    p.add_argument("--adapt-steps", type=int, default=0,
                   help="per-clip test-time adaptation: fine-tune the GAN "
                        "generator for N steps on the clip's own clean "
                        "context (real gap AR-filled, synthetic training "
                        "gaps, in-clip probe gate -- runtime/adapt.py); "
                        "0 = off. Measured gap-SDR NEGATIVE (-0.9 dB; "
                        "LSD/ODG improve) -- results/gan_tta_adapt_eval.json")
    p.add_argument("--adapt-lr", type=float, default=5e-5)
    p.add_argument("--adapt-batch", type=int, default=8)
    p.add_argument("--adapt-probe-every", type=int, default=25)
    p.add_argument("--adapt-n-gaps", type=int, default=4,
                   help="synthetic gaps per adaptation example (the headline "
                        "training corruption)")
    p.add_argument("--adapt-seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument(
        "--n-gaps", type=int, default=1,
        help="IRMAS-style multi-gap condition (IRMAS_gaps.m): N gaps of "
             "10-80 ms per clip with spacing constraints; solved "
             "sequentially left to right")
    p.add_argument(
        "--golden", type=str, default=None,
        help="directory of the reference's shipped reconstructions "
        "(test_samples_reconstructed/): score them with this metric stack, "
        "check the recorded model_comparison.mat scalars reproduce, and "
        "compare this framework's outputs against those files "
        "(gap-SDR deltas + spectrogram L2)",
    )
    return p


#: model_comparison.mat scalars (decoded in SURVEY.md §6), written by
#: ``model_eval.m:60,84`` for the anchor clip 81-121543-0008.flac.
RECORDED_GAP_SDR = {"cnnlstm": -2.12, "gan": -1.39}
GOLDEN_ANCHOR = "81-121543-0008"
GOLDEN_TAGS = ("gan", "cnnlstm")
#: our model names -> the reference's reconstruction filename tag
GOLDEN_TAG_OF_MODEL = {"gan": "gan", "cnn_blstm": "cnnlstm"}


def matlab_gap_slice(sr: int, gap_start_s: float, gap_len_s: float) -> slice:
    """The eval-gap sample range exactly as ``model_eval.m:33-36`` builds it:
    MATLAB 1-based inclusive ``temp(fs*2.0 : fs*2.08) = 0``."""
    start = int(sr * gap_start_s) - 1  # 1-based -> 0-based
    end = int(sr * (gap_start_s + gap_len_s))  # inclusive endpoint
    return slice(start, end + 1)


def golden_gap_sdr(clean: np.ndarray, restored: np.ndarray, gap: slice) -> float:
    """``snr(signal(gap), signal(gap)-solution(gap))`` (``model_eval.m:60``)."""
    err = clean[..., gap] - restored[..., gap]
    num = float(np.sum(clean[..., gap] ** 2))
    return 10.0 * float(np.log10(num / (np.sum(err**2) + 1e-12)))


def _spec_l2(a: np.ndarray, b: np.ndarray) -> float:
    """RMS distance between log1p-magnitude spectrograms, always in the GAN
    feature domain (n_fft 512 / hop 128 / win 512, reference
    ``models/GAN/dataset.py:122`` + ``config.yaml:12-15``) so the number is
    comparable across model configs."""
    from ml_audio_inpainting_tpu.ops import stft

    kw = dict(n_fft=512, hop_length=128, win_length=512)
    # Batch the pair and reduce to a real scalar ON DEVICE: the axon TPU
    # platform cannot materialize unbatched/complex STFT outputs
    # (UNIMPLEMENTED transfer), and a scalar fetch is cheaper anyway.
    pair = jnp.stack([jnp.asarray(a), jnp.asarray(b)])
    mags = jnp.log1p(jnp.abs(stft(pair, **kw)))
    return float(jnp.sqrt(jnp.mean((mags[0] - mags[1]) ** 2)))


def run_golden(args, cfg, files, clean: np.ndarray) -> dict:
    """Score the reference's shipped reconstructions and (optionally) this
    framework's models against them.  Returns the JSON payload."""
    from ml_audio_inpainting_tpu.cli.inpaint import _build_runner
    from ml_audio_inpainting_tpu.data.audio_io import load_audio

    sr = cfg.data.sample_rate
    golden_dir = Path(args.golden)
    gap = matlab_gap_slice(sr, args.gap_start, args.gap_len)

    reference_outputs: dict = {}
    ref_audio: dict = {}
    for tag in GOLDEN_TAGS:
        per_file = {}
        ref_audio[tag] = {}
        for j, f in enumerate(files):
            path = golden_dir / f"{f.stem}_{tag}_inpainted.flac"
            if not path.exists():
                continue
            rec = np.asarray(
                load_audio(path, sample_rate=sr, max_len=cfg.data.max_len_s)[0]
            )
            ref_audio[tag][f.stem] = rec
            per_file[f.stem] = round(golden_gap_sdr(clean[j], rec, gap), 3)
        if per_file:
            reference_outputs[tag] = {
                "gap_sdr_db": per_file,
                "mean_gap_sdr_db": round(float(np.mean(list(per_file.values()))), 3),
            }

    anchor_check = {
        tag: {
            "recomputed_gap_sdr_db": reference_outputs[tag]["gap_sdr_db"].get(
                GOLDEN_ANCHOR
            ),
            "recorded_gap_sdr_db": RECORDED_GAP_SDR[tag],
        }
        for tag in GOLDEN_TAGS
        if tag in reference_outputs
        and GOLDEN_ANCHOR in reference_outputs[tag]["gap_sdr_db"]
    }

    ours: dict = {}
    B = len(files)
    gs = jnp.full((B,), int(args.gap_start * sr), jnp.int32)
    gl = jnp.full((B,), int(args.gap_len * sr), jnp.int32)
    for model_name in args.models:
        m_args = argparse.Namespace(**vars(args))
        m_args.model = model_name
        runner = _build_runner(m_args, cfg, clean.shape[-1])
        restored = np.asarray(runner(jnp.asarray(clean), gs, gl))
        per_file = {
            f.stem: round(golden_gap_sdr(clean[j], restored[j], gap), 3)
            for j, f in enumerate(files)
        }
        entry = {
            "gap_sdr_db": per_file,
            "mean_gap_sdr_db": round(float(np.mean(list(per_file.values()))), 3),
        }
        for tag in reference_outputs:
            deltas = {
                stem: round(
                    per_file[stem] - reference_outputs[tag]["gap_sdr_db"][stem], 3
                )
                for stem in per_file
                if stem in reference_outputs[tag]["gap_sdr_db"]
            }
            l2 = {
                f.stem: round(_spec_l2(restored[j], ref_audio[tag][f.stem]), 4)
                for j, f in enumerate(files)
                if f.stem in ref_audio[tag]
            }
            entry[f"delta_gap_sdr_vs_{tag}_db"] = deltas
            entry[f"mean_delta_vs_{tag}_db"] = round(
                float(np.mean(list(deltas.values()))), 3
            )
            entry[f"spec_l2_vs_{tag}"] = l2
        ours[model_name] = entry

    return {
        "condition": {
            "gap_start_s": args.gap_start,
            "gap_len_s": args.gap_len,
            "gap_slice": [gap.start, gap.stop],
            "gap_convention": "model_eval.m:33-36 (MATLAB 1-based inclusive)",
            "files": [f.name for f in files],
            "golden_dir": str(golden_dir),
        },
        "recorded_model_comparison": {
            "anchor": GOLDEN_ANCHOR,
            "gap_sdr_db": RECORDED_GAP_SDR,
            "source": "model_comparison.mat via model_eval.m:60 (SURVEY.md §6)",
        },
        "anchor_check": anchor_check,
        "reference_outputs": reference_outputs,
        "ours": ours,
    }


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.cli.inpaint import _build_runner, _collect
    from ml_audio_inpainting_tpu.data.audio_io import load_audio, save_audio
    from ml_audio_inpainting_tpu.ops.gaps import gap_mask
    from ml_audio_inpainting_tpu.train.auditory import psm_score
    from ml_audio_inpainting_tpu.train.peaq import odg_score
    from ml_audio_inpainting_tpu.train.metrics import (
        fwseg_snr,
        gap_sdr,
        log_spectral_distance,
        snr,
    )
    from ml_audio_inpainting_tpu.utils.config import Config, load_config

    args = build_argparser().parse_args(argv)
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
    cfg = load_config(args.config) if args.config else Config()
    sr = cfg.data.sample_rate

    files = _collect(Path(args.input))
    clean = np.stack(
        [load_audio(f, sample_rate=sr, max_len=cfg.data.max_len_s)[0] for f in files]
    )
    B = len(files)
    gs = jnp.full((B,), int(args.gap_start * sr), jnp.int32)
    gl = jnp.full((B,), int(args.gap_len * sr), jnp.int32)
    if "refiner" in args.models:
        from ml_audio_inpainting_tpu.train.refiner_trainer import MAX_GAP

        if int(args.gap_len * sr) > MAX_GAP:
            raise SystemExit(
                f"--models refiner supports gaps up to {MAX_GAP} samples "
                f"({MAX_GAP / sr * 1000:.0f} ms); longer gaps would be "
                "silently zero-filled past the head's window."
            )
        if args.n_gaps > 1:
            raise SystemExit(
                "--models refiner has no mask-driven multi-gap path; the "
                "sequential fallback would feed the frozen GAN the other "
                "gaps' zeros as signal (scores ~0 -- see CLAUDE.md). Use "
                "gan/cnn_blstm for --n-gaps."
            )
    if args.golden:
        payload = run_golden(args, cfg, files, clean)
        for tag, chk in payload["anchor_check"].items():
            print(
                f"golden anchor {tag}: recomputed "
                f"{chk['recomputed_gap_sdr_db']} dB vs recorded "
                f"{chk['recorded_gap_sdr_db']} dB"
            )
        for name, entry in payload["ours"].items():
            line = f"{name}: mean gap-SDR {entry['mean_gap_sdr_db']} dB"
            for tag in GOLDEN_TAGS:
                k = f"mean_delta_vs_{tag}_db"
                if k in entry:
                    line += f", vs {tag} {entry[k]:+} dB"
            print(line)
        if args.output_json:
            Path(args.output_json).write_text(json.dumps(payload, indent=2))
            print(f"wrote {args.output_json}")
        return

    if args.n_gaps > 1:
        # IRMAS-style multi-gap condition (IRMAS_gaps.m:1-151): N gaps per
        # clip, spacing >= a solver context so sequential left-to-right
        # solving sees no unsolved gap inside its local window.
        from ml_audio_inpainting_tpu.data.multigap import multi_gap_mask

        keys = jax.random.split(jax.random.PRNGKey(7), B)
        masks, starts, lens = jax.vmap(
            lambda k: multi_gap_mask(
                k,
                clean.shape[-1],
                args.n_gaps,
                max_gap_ms=args.gap_len * 1000.0,
                min_dist_samples=5000,
            )
        )(keys)
        gapm = 1.0 - masks
    else:
        tmask = jax.vmap(lambda s, l: gap_mask(clean.shape[-1], s, l))(gs, gl)
        gapm = 1.0 - tmask

    if args.adapt_steps > 0 and args.n_gaps > 1:
        raise SystemExit("--adapt-steps has no multi-gap eval path yet")
    if args.n_gaps > 1 and {"cnn_phase", "cnn_phase_anchored"} & set(args.models):
        # The sequential per-gap fallback feeds a neural model the other
        # gaps' zeros as signal (scores ~0 -- CLAUDE.md); cnn_phase has no
        # mask-driven multi-gap path yet.
        raise SystemExit("--models cnn_phase[_anchored] supports single-gap eval only")

    results = {}
    adapt_info: dict = {}
    for model_name in args.models:
        m_args = argparse.Namespace(**vars(args))
        m_args.model = model_name
        runner = _build_runner(m_args, cfg, clean.shape[-1])
        if args.adapt_steps > 0 and model_name == "gan":
            # Per-clip test-time adaptation (runtime/adapt.py): each clip
            # gets its own probe-gated fine-tuned generator.
            from ml_audio_inpainting_tpu.runtime.adapt import GanClipAdapter

            rcfg = getattr(runner, "cfg", cfg)
            adapter = GanClipAdapter(
                rcfg, runner.model, runner.inpaint_fn,
                steps=args.adapt_steps, lr=args.adapt_lr,
                batch=args.adapt_batch,
                probe_every=args.adapt_probe_every,
                n_gaps=args.adapt_n_gaps,
                ar_order=args.ar_order, ar_context=args.ar_context,
            )
            outs = []
            for j, f in enumerate(files):
                vars_j, info = adapter.adapt(
                    runner.variables, jnp.asarray(clean[j]),
                    int(gs[j]), int(gl[j]), seed=args.adapt_seed,
                )
                r, _ = runner.inpaint_fn(
                    vars_j, jnp.asarray(clean[j])[None],
                    gs[j : j + 1], gl[j : j + 1],
                )
                outs.append(np.asarray(r[0]))
                adapt_info[f.stem] = info
                print(
                    f"adapt {f.stem}: best step {info['best_step']} "
                    f"probe {info['best_probe_sdr']} dB"
                )
            restored = np.stack(outs)
        elif args.n_gaps > 1 and model_name in ("gan", "cnn_blstm"):
            # Neural models reconstruct ALL gaps in one mask-driven pass
            # (the masked architectures handle arbitrary hole patterns).
            from ml_audio_inpainting_tpu.runtime.inference import (
                make_cnn_inpaint_mask_fn,
                make_gan_inpaint_mask_fn,
            )

            rcfg = getattr(runner, "cfg", cfg)
            if model_name == "gan":
                mask_fn = make_gan_inpaint_mask_fn(
                    rcfg, runner.model, mode=args.mode,
                    phase=args.phase, gl_iters=args.gl_iters,
                    compute_dtype=(
                        jnp.bfloat16 if args.infer_dtype == "bf16" else None
                    ))
            else:
                mask_fn = make_cnn_inpaint_mask_fn(
                    rcfg, runner.model,
                    phase=args.phase, gl_iters=args.gl_iters)
            restored = np.asarray(
                mask_fn(runner.variables, jnp.asarray(clean), masks)[0]
            )
        elif args.n_gaps > 1:
            restored = jnp.asarray(clean) * masks
            for g in range(args.n_gaps):
                restored = jnp.asarray(runner(restored, starts[:, g], lens[:, g]))
            restored = np.asarray(restored)
        else:
            restored = np.asarray(runner(jnp.asarray(clean), gs, gl))
        r = {
            "gap_sdr_db": np.asarray(gap_sdr(jnp.asarray(clean), jnp.asarray(restored), gapm)),
            "snr_db": np.asarray(snr(jnp.asarray(clean), jnp.asarray(restored))),
            "lsd_db": np.asarray(
                log_spectral_distance(jnp.asarray(clean), jnp.asarray(restored))
            ),
            "fwseg_snr_db": np.asarray(fwseg_snr(jnp.asarray(clean), jnp.asarray(restored))),
            "psm": np.asarray(
                psm_score(jnp.asarray(clean), jnp.asarray(restored))
            ),
            "odg": np.asarray(
                odg_score(jnp.asarray(clean), jnp.asarray(restored))
            ),
        }
        results[model_name] = {k: [round(float(x), 3) for x in v] for k, v in r.items()}
        if args.reconstructions:
            outdir = Path(args.reconstructions)
            outdir.mkdir(parents=True, exist_ok=True)
            for j, f in enumerate(files):
                save_audio(restored[j], outdir / f"{f.stem}_{model_name}_inpainted.flac", sr)

    header = (
        f"{'model':>14} | {'gap SDR':>8} | {'SNR':>7} | {'LSD':>6} | "
        f"{'fwsegSNR':>8} | {'PSM':>6} | {'ODG':>6}"
    )
    print(header)
    print("-" * len(header))
    for name, r in results.items():
        print(
            f"{name:>14} | {np.mean(r['gap_sdr_db']):8.2f} | {np.mean(r['snr_db']):7.2f} | "
            f"{np.mean(r['lsd_db']):6.2f} | {np.mean(r['fwseg_snr_db']):8.2f} | "
            f"{np.mean(r['psm']):6.3f} | {np.mean(r['odg']):6.2f}"
        )

    if args.output_json:
        condition = {
            "gap_start_s": args.gap_start,
            "gap_len_s": args.gap_len,
            "files": [f.name for f in files],
        }
        if any(m in ("gan", "cnn_blstm") for m in args.models):
            # --phase only affects the neural reconstruction paths; don't
            # stamp classical-only artifacts with a regime they ignore.
            condition["phase"] = args.phase
        if args.n_gaps > 1:
            condition.update(
                {
                    "n_gaps": args.n_gaps,
                    "gap_len_ms_range": [10.0, args.gap_len * 1000.0],
                    "min_dist_samples": 5000,
                    "scheme": "IRMAS_gaps.m-style, solved left to right",
                }
            )
        if args.adapt_steps > 0:
            condition["adapt"] = {
                "steps": args.adapt_steps,
                "lr": args.adapt_lr,
                "batch": args.adapt_batch,
                "n_gaps": args.adapt_n_gaps,
                "probe_every": args.adapt_probe_every,
                "seed": args.adapt_seed,
            }
        from ml_audio_inpainting_tpu.train.peaq import ODG_MAPPING

        condition["odg_mapping"] = ODG_MAPPING
        payload = {"condition": condition, "results": results}
        if adapt_info:
            payload["adapt_info"] = adapt_info
        Path(args.output_json).write_text(json.dumps(payload, indent=2))
        print(f"wrote {args.output_json}")


if __name__ == "__main__":
    main()
