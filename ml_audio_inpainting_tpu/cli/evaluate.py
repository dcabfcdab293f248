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
                   help="any of: gan cnn_blstm janssen arinpaint segmentation aspain sspain")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--input", type=str, default="/root/reference/test_samples",
                   help="eval clips directory (default: the 9 bundled samples)")
    p.add_argument("--output-json", type=str, default=None)
    p.add_argument("--reconstructions", type=str, default=None,
                   help="also write inpainted FLACs here")
    p.add_argument("--gap-start", type=float, default=2.0)
    p.add_argument("--gap-len", type=float, default=0.08)
    p.add_argument("--ar-order", type=int, default=512)
    p.add_argument("--maxit", type=int, default=10)
    p.add_argument("--ar-method", choices=["lpc", "arburg"], default="lpc")
    p.add_argument("--mode", choices=["parity", "enhanced"], default="parity")
    p.add_argument("--batch-size", type=int, default=16)
    return p


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.cli.inpaint import _build_runner, _collect
    from ml_audio_inpainting_tpu.data.audio_io import load_audio, save_audio
    from ml_audio_inpainting_tpu.ops.gaps import gap_mask
    from ml_audio_inpainting_tpu.train.metrics import (
        fwseg_snr,
        gap_sdr,
        log_spectral_distance,
        snr,
    )
    from ml_audio_inpainting_tpu.utils.config import Config, load_config

    args = build_argparser().parse_args(argv)
    cfg = load_config(args.config) if args.config else Config()
    sr = cfg.data.sample_rate

    files = _collect(Path(args.input))
    clean = np.stack(
        [load_audio(f, sample_rate=sr, max_len=cfg.data.max_len_s)[0] for f in files]
    )
    B = len(files)
    gs = jnp.full((B,), int(args.gap_start * sr), jnp.int32)
    gl = jnp.full((B,), int(args.gap_len * sr), jnp.int32)
    tmask = jax.vmap(lambda s, l: gap_mask(clean.shape[-1], s, l))(gs, gl)
    gapm = 1.0 - tmask

    results = {}
    for model_name in args.models:
        m_args = argparse.Namespace(**vars(args))
        m_args.model = model_name
        runner = _build_runner(m_args, cfg, clean.shape[-1])
        restored = np.asarray(runner(jnp.asarray(clean), gs, gl))
        r = {
            "gap_sdr_db": np.asarray(gap_sdr(jnp.asarray(clean), jnp.asarray(restored), gapm)),
            "snr_db": np.asarray(snr(jnp.asarray(clean), jnp.asarray(restored))),
            "lsd_db": np.asarray(
                log_spectral_distance(jnp.asarray(clean), jnp.asarray(restored))
            ),
            "fwseg_snr_db": np.asarray(fwseg_snr(jnp.asarray(clean), jnp.asarray(restored))),
        }
        results[model_name] = {k: [round(float(x), 3) for x in v] for k, v in r.items()}
        if args.reconstructions:
            outdir = Path(args.reconstructions)
            outdir.mkdir(parents=True, exist_ok=True)
            for j, f in enumerate(files):
                save_audio(restored[j], outdir / f"{f.stem}_{model_name}_inpainted.flac", sr)

    header = f"{'model':>14} | {'gap SDR':>8} | {'SNR':>7} | {'LSD':>6} | {'fwsegSNR':>8}"
    print(header)
    print("-" * len(header))
    for name, r in results.items():
        print(
            f"{name:>14} | {np.mean(r['gap_sdr_db']):8.2f} | {np.mean(r['snr_db']):7.2f} | "
            f"{np.mean(r['lsd_db']):6.2f} | {np.mean(r['fwseg_snr_db']):8.2f}"
        )

    if args.output_json:
        payload = {
            "condition": {
                "gap_start_s": args.gap_start,
                "gap_len_s": args.gap_len,
                "files": [f.name for f in files],
            },
            "results": results,
        }
        Path(args.output_json).write_text(json.dumps(payload, indent=2))
        print(f"wrote {args.output_json}")


if __name__ == "__main__":
    main()
