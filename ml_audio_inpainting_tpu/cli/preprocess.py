"""Corpus preprocessing CLI: batch gap insertion over a dataset tree.

Replaces ``pre_process_dataset.py`` (walk LibriSpeech, insert one random
gap per file, mirror the directory structure to ``*_PROCESSED``) and
``add_gaps.py`` (single-file fixed gap).  Gap sampling and application run
as one vmapped device op per batch instead of per-file host NumPy -- the
reference cites ~4.5 min for train-clean-100 (``pre_process_dataset.py:9``);
this path is decode-bound.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Insert gaps into a corpus")
    p.add_argument("--input", required=True, help="corpus root (or one file)")
    p.add_argument("--output", required=True, help="mirrored output root (or file)")
    p.add_argument("--gap-len", type=float, default=0.1, help="seconds (reference default)")
    p.add_argument("--gap-start", type=float, default=None,
                   help="fixed start (s); random when omitted")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--max-len", type=float, default=5.0)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.data.audio_io import load_audio, save_audio
    from ml_audio_inpainting_tpu.data.dataset import list_audio_files
    from ml_audio_inpainting_tpu.ops.gaps import random_gap_mask

    args = build_argparser().parse_args(argv)
    inp, out = Path(args.input), Path(args.output)
    files = list_audio_files(inp) if inp.is_dir() else [inp]
    n_samples = int(args.sample_rate * args.max_len)
    key = jax.random.PRNGKey(args.seed)

    sample_fn = jax.jit(
        jax.vmap(
            lambda k: random_gap_mask(
                k, n_samples, args.gap_len, args.sample_rate, gap_start_s=args.gap_start
            )[0]
        )
    )

    done = 0
    for i in range(0, len(files), args.batch_size):
        chunk = files[i : i + args.batch_size]
        audio = np.stack(
            [
                load_audio(f, sample_rate=args.sample_rate, max_len=args.max_len)[0]
                for f in chunk
            ]
        )
        key, sub = jax.random.split(key)
        masks = sample_fn(jax.random.split(sub, len(chunk)))
        gapped = np.asarray(jnp.asarray(audio) * masks)
        for j, f in enumerate(chunk):
            dest = (out / f.relative_to(inp)) if inp.is_dir() else out
            save_audio(gapped[j], dest, args.sample_rate, normalize=False)
        done += len(chunk)
        print(f"{done}/{len(files)}", end="\r")
    print(f"\nprocessed {done} files -> {out}")


if __name__ == "__main__":
    main()
