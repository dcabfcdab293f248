"""Eval gaps-table builder.

Covers the reference's two dataset builders:

* ``models/AudioReg/create_librispeech_dataset.m`` -- named eval clips, 5 s
  crop, one fixed gap (80 ms @ t=2 s) per requested gap length, exported as
  a mask table (``gaps_table_librispeech.mat``).
* ``models/AudioReg/irmas/IRMAS_gaps.m`` -- the multi-gap music variant:
  N gaps per file with lengths in [min, max] ms, minimum spacing, cos^2
  edge fades, exported with a documented read recipe.

Output here is a JSON table (masks stored as interval lists, not dense
arrays) plus optionally the gapped FLAC files next to it.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Build an eval gaps table")
    p.add_argument("--input", default="/root/reference/test_samples")
    p.add_argument("--output", default="gaps_table.json")
    p.add_argument("--write-audio", type=str, default=None,
                   help="also write gapped FLACs to this directory")
    p.add_argument("--mode", choices=["fixed", "multi"], default="fixed")
    # fixed mode (create_librispeech_dataset.m:18-20)
    p.add_argument("--gap-lens-ms", type=int, nargs="+", default=[80])
    p.add_argument("--gap-start", type=float, default=2.0)
    # multi mode (IRMAS_gaps.m)
    p.add_argument("--n-gaps", type=int, default=10)
    p.add_argument("--min-gap-ms", type=float, default=10.0)
    p.add_argument("--max-gap-ms", type=float, default=80.0)
    p.add_argument("--min-dist", type=int, default=4096, help="samples between gaps")
    p.add_argument("--fade-len", type=int, default=32, help="cos^2 fade samples (0 = hard)")
    p.add_argument("--max-len", type=float, default=5.0)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.cli.inpaint import _collect
    from ml_audio_inpainting_tpu.data.audio_io import load_audio, save_audio
    from ml_audio_inpainting_tpu.data.multigap import (
        apply_gaps_with_fades,
        multi_gap_mask,
    )
    from ml_audio_inpainting_tpu.ops.gaps import gap_mask

    args = build_argparser().parse_args(argv)
    files = _collect(Path(args.input))
    sr = args.sample_rate
    n = int(sr * args.max_len)

    table = {
        "sample_rate": sr,
        "n_samples": n,
        "mode": args.mode,
        "read_recipe": (
            "mask[i] reconstructs as: ones(n_samples); for (s, l) in "
            "entries[i]['gaps']: mask[s:s+l] = 0"
        ),
        "entries": [],
    }
    key = jax.random.PRNGKey(args.seed)

    for f in files:
        audio, _ = load_audio(f, sample_rate=sr, max_len=args.max_len)
        entry = {"file": f.name}
        if args.mode == "fixed":
            gaps_by_len = {}
            for ms in args.gap_lens_ms:
                gl = int(ms * sr / 1000)
                gs = int(args.gap_start * sr)
                gaps_by_len[str(ms)] = [[gs, gl]]
            entry["gaps_by_len_ms"] = gaps_by_len
            entry["gaps"] = gaps_by_len[str(args.gap_lens_ms[0])]
        else:
            key, sub = jax.random.split(key)
            _, starts, lengths = multi_gap_mask(
                sub, n, args.n_gaps,
                min_gap_ms=args.min_gap_ms, max_gap_ms=args.max_gap_ms,
                sample_rate=sr, min_dist_samples=args.min_dist,
            )
            entry["gaps"] = [
                [int(s), int(l)] for s, l in zip(np.asarray(starts), np.asarray(lengths))
            ]
        table["entries"].append(entry)

        if args.write_audio:
            outdir = Path(args.write_audio)
            starts = jnp.asarray([g[0] for g in entry["gaps"]])
            lengths = jnp.asarray([g[1] for g in entry["gaps"]])
            if args.fade_len > 0 and args.mode == "multi":
                gapped = np.asarray(
                    apply_gaps_with_fades(jnp.asarray(audio), starts, lengths,
                                          fade_len=args.fade_len)
                )
            else:
                m = np.ones(n, np.float32)
                for s, l in entry["gaps"]:
                    m[s : s + l] = 0.0
                gapped = audio * m
            save_audio(gapped, outdir / f"{f.stem}_gapped.flac", sr, normalize=False)

    Path(args.output).write_text(json.dumps(table, indent=1))
    print(f"wrote {args.output} ({len(table['entries'])} entries)")


if __name__ == "__main__":
    main()
