"""Per-condition probe tuning for the classical solvers.

The round-2/3 sweeps (``results/ar_context_sweep.json``,
``results/ar_blend_sweep.json``, ``results/janssen_tuning.json``) showed that
probe-tuned solver settings are CONDITION-SPECIFIC: the 80 ms winners
(context 8192, gentle-ramp blend) regress at other gap lengths
(``results/ar_tuned_gl*.json``).  This CLI operationalizes the probe
protocol per condition so any deployment target can re-tune honestly:

1. grid-sweep solver hyperparameters on the REAL-clip probe set (the
   reference's shipped validation clips x several gap positions -- disjoint
   from the 9 eval clips; same protocol as ``cli/train.py --probe-dir``,
   reference split: ``models/CNNBLSTM/output/true_audio_*.flac``),
2. select the best mean probe gap-SDR,
3. optionally score the winner once on the eval set.

Reference counterparts: the solvers themselves follow
``models/AudioReg/utils/arinpaint.m`` / ``janssen_inp.m``; the reference has
no tuning driver (its ``train.m:137`` fixes maxlen=w) -- this protocol is the
framework's own.
"""

from __future__ import annotations

import argparse
import itertools
import json
import time
from pathlib import Path

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Probe-tune a classical solver for one gap condition")
    p.add_argument("--model", choices=["arinpaint", "janssen"], default="arinpaint")
    p.add_argument("--gap-len", type=float, required=True, help="gap length (s) of the target condition")
    p.add_argument("--gap-start", type=float, default=2.0, help="eval gap start (s)")
    p.add_argument("--probe-dir", required=True,
                   help="directory of REAL held-out probe clips (never the eval clips)")
    p.add_argument("--probe-positions", type=float, nargs="+",
                   default=[1.0, 1.5, 2.5, 3.0, 3.5],
                   help="gap start times (s) per probe clip")
    p.add_argument("--contexts", type=int, nargs="+", default=[4096, 8192, 16384])
    p.add_argument("--orders", type=int, nargs="+", default=[512])
    p.add_argument("--blends", nargs="+", default=["cos2", "linear:0.2", "sigmoid:2"],
                   help="arinpaint blend tokens: cos2 | linear:<floor> | sigmoid:<k>")
    p.add_argument("--maxits", type=int, nargs="+", default=[5, 10],
                   help="janssen iteration counts")
    p.add_argument("--ar-method", choices=["lpc", "arburg"], default="lpc")
    p.add_argument("--eval", action="store_true",
                   help="score the probe winner on the eval clips")
    p.add_argument("--eval-all", action="store_true",
                   help="ANALYSIS ONLY: score every grid config on the eval "
                        "clips too, to measure how well the probe ranking "
                        "transfers (the honest deployable number remains the "
                        "probe winner's eval score)")
    p.add_argument("--input", default=None, help="eval clips dir (default: bundled samples)")
    p.add_argument("--config", default=None)
    p.add_argument("--output-json", default=None)
    return p


def _parse_blend(token: str):
    if ":" in token:
        fam, param = token.split(":", 1)
        return fam, float(param)
    return token, 0.0


def _grid(args):
    if args.model == "arinpaint":
        for ctx, order, blend in itertools.product(args.contexts, args.orders, args.blends):
            fam, param = _parse_blend(blend)
            yield {"ar_context": ctx, "ar_order": order,
                   "ar_blend": fam, "ar_blend_param": param, "maxit": 10}
    else:
        for ctx, order, maxit in itertools.product(args.contexts, args.orders, args.maxits):
            yield {"ar_context": ctx, "ar_order": order, "maxit": maxit,
                   "ar_blend": "cos2", "ar_blend_param": 0.0}


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.cli.inpaint import _build_runner, _collect
    from ml_audio_inpainting_tpu.data.audio_io import load_audio
    from ml_audio_inpainting_tpu.data.probe import load_real_probe_set
    from ml_audio_inpainting_tpu.ops.gaps import gap_mask
    from ml_audio_inpainting_tpu.train.metrics import gap_sdr
    from ml_audio_inpainting_tpu.utils.config import Config, load_config

    args = build_argparser().parse_args(argv)
    cfg = load_config(args.config) if args.config else Config()
    sr = cfg.data.sample_rate

    clips, starts, n_files = load_real_probe_set(
        args.probe_dir, args.probe_positions, sr, cfg.data.max_len_s,
        gap_len_s=args.gap_len,
    )
    print(f"probe: {n_files} clips x {len(args.probe_positions)} positions, "
          f"gap {args.gap_len * 1000:.0f} ms")
    clips_j = jnp.asarray(clips)
    gs = jnp.asarray(starts)
    gl = jnp.full_like(gs, int(args.gap_len * sr))
    gapm = 1.0 - jax.vmap(lambda s, l: gap_mask(clips.shape[-1], s, l))(gs, gl)

    def score(runner, audio, gs, gl, gapm):
        restored = runner(audio, gs, gl)
        return float(jnp.mean(gap_sdr(audio, restored, gapm)))

    eval_pack = None
    if args.eval or args.eval_all:
        eval_dir = Path(args.input or "/root/reference/test_samples")
        files = _collect(eval_dir)
        clean = np.stack([
            load_audio(f, sample_rate=sr, max_len=cfg.data.max_len_s)[0]
            for f in files
        ])
        egs = jnp.full((len(files),), int(args.gap_start * sr), jnp.int32)
        egl = jnp.full((len(files),), int(args.gap_len * sr), jnp.int32)
        egapm = 1.0 - jax.vmap(lambda s, l: gap_mask(clean.shape[-1], s, l))(egs, egl)
        eval_pack = (files, jnp.asarray(clean), egs, egl, egapm)

    rows = []
    best = None
    for conf in _grid(args):
        m_args = argparse.Namespace(
            model=args.model, gap_len=args.gap_len, ar_method=args.ar_method,
            config=args.config, checkpoint=None, infer_dtype="f32", **conf,
        )
        t0 = time.perf_counter()
        runner = _build_runner(m_args, cfg, clips.shape[-1])
        probe_db = score(runner, clips_j, gs, gl, gapm)
        row = {**conf, "probe_mean_db": round(probe_db, 3),
               "elapsed_s": round(time.perf_counter() - t0, 1)}
        if args.eval_all:
            _, eclean, egs, egl, egapm = eval_pack
            row["eval_mean_db"] = round(score(runner, eclean, egs, egl, egapm), 3)
        rows.append(row)
        print(row)
        if best is None or probe_db > best[0]:
            best = (probe_db, conf, runner)

    probe_best, best_conf, best_runner = best
    print(f"probe winner: {best_conf} ({probe_best:.3f} dB)")

    out = {
        "what": (f"per-condition probe tuning of {args.model} at "
                 f"{args.gap_len * 1000:.0f} ms gaps"),
        "protocol": (f"{n_files} real probe clips x {len(args.probe_positions)} "
                     f"positions from {args.probe_dir} (disjoint from eval); "
                     f"winner optionally scored once on the eval clips"),
        "grid": rows,
        "probe_best": {**best_conf, "probe_mean_db": round(probe_best, 3)},
    }

    if args.eval or args.eval_all:
        files, eclean, egs, egl, egapm = eval_pack
        eval_db = score(best_runner, eclean, egs, egl, egapm)
        out["eval"] = {
            "files": [f.name for f in files],
            "gap_start_s": args.gap_start,
            "mean_gap_sdr_db": round(eval_db, 3),
        }
        print(f"eval ({len(files)} clips): {eval_db:.3f} dB")

    if args.output_json:
        Path(args.output_json).write_text(json.dumps(out, indent=1))
        print(f"wrote {args.output_json}")


if __name__ == "__main__":
    main()
