"""Classical AR benchmark grid: the ``models/AudioReg/train.m`` driver.

Reference behavior: grid over AR order p in {256, 512, 1024, 2048, 3072} x
estimator in {arburg, lpc} (``train.m:13-15``); for each eval signal and gap,
run 5 methods -- forward/backward extrapolation, gap-wise Janssen (with
per-iteration solutions), and windowed OLA Janssen with hann / rect / tukey
windows (``train.m:131-174``); record per-iteration SDR and wall-clock per
method; checkpoint results incrementally with skip-on-resume
(``train.m:55-57, 79-83, 234-236``).

TPU-first deltas: all eval signals share one shape and gap spec, so each
method runs as a single ``vmap``-ed batched solve across the whole signal
set (the reference loops signals and MATLAB ``parfor``s segments).  Results
go to ``results_<p>_<method>.json`` (the ``results_NN.mat`` equivalent);
PEMO-Q/PEAQ are replaced by the open fwseg-SNR proxy (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

METHODS = ("extrapolation", "janssen", "janssen_hann", "janssen_rect", "janssen_tukey")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Classical AR benchmark grid (train.m)")
    p.add_argument("--input", default="/root/reference/test_samples")
    p.add_argument("--output-dir", default="./ar_results")
    p.add_argument("--orders", type=int, nargs="+", default=[256, 512, 1024, 2048, 3072])
    p.add_argument("--estimators", nargs="+", default=["arburg", "lpc"])
    p.add_argument("--gap-lens-ms", type=int, nargs="+", default=[80])
    p.add_argument("--gap-start", type=float, default=2.0)
    p.add_argument("--maxit", type=int, default=10)
    p.add_argument("--w", type=int, default=4096, help="OLA window (train.m:31)")
    p.add_argument("--a", type=int, default=1024, help="OLA shift (train.m:32)")
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--chunk", type=int, default=3,
                   help="signals per batched solve (bounds device memory for "
                        "the windowed methods)")
    return p


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.classical.arinpaint import arinpaint
    from ml_audio_inpainting_tpu.classical.janssen import janssen_gapwise
    from ml_audio_inpainting_tpu.classical.ola import segmentation_inpaint
    from ml_audio_inpainting_tpu.cli.inpaint import _collect
    from ml_audio_inpainting_tpu.data.audio_io import load_audio
    from ml_audio_inpainting_tpu.ops.gaps import gap_mask
    from ml_audio_inpainting_tpu.train.metrics import fwseg_snr, gap_sdr

    args = build_argparser().parse_args(argv)
    outdir = Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)

    files = _collect(Path(args.input))
    sr = 16000
    clean = jnp.asarray(
        np.stack([load_audio(f, sample_rate=sr, max_len=5.0)[0] for f in files])
    )
    B, n = clean.shape

    def chunked(solver):
        """Apply a vmapped per-signal solver in --chunk-sized batches
        (keeps the windowed-Janssen working set inside device memory)."""

        def run(xs, ms, ss, ls):
            outs = []
            for i in range(0, xs.shape[0], args.chunk):
                sl = slice(i, i + args.chunk)
                outs.append(
                    jax.vmap(solver)(xs[sl], ms[sl], ss[sl], ls[sl])
                )
            return jnp.concatenate(outs, axis=0)

        return run

    for gap_ms in args.gap_lens_ms:
        gap_len = int(gap_ms * sr / 1000)
        max_gap = 1 << (gap_len - 1).bit_length()
        gs = jnp.full((B,), int(args.gap_start * sr), jnp.int32)
        gl = jnp.full((B,), gap_len, jnp.int32)
        tmask = jax.vmap(lambda s, l: gap_mask(n, s, l))(gs, gl)
        gapped = clean * tmask
        gapm = 1.0 - tmask

        for p_order in args.orders:
            for est in args.estimators:
                out_path = outdir / f"results_p{p_order}_{est}_gap{gap_ms}ms.json"
                if args.resume and out_path.exists():
                    print(f"skip (resume): {out_path}")
                    continue

                entry = {
                    "p": p_order, "estimator": est, "gap_ms": gap_ms,
                    "maxit": args.maxit, "w": args.w, "a": args.a,
                    "signals": [f.name for f in files], "methods": {},
                }

                def record(name, restored_fn, per_iteration=None):
                    t0 = time.perf_counter()
                    restored = restored_fn()
                    restored = np.asarray(restored)  # force execution
                    elapsed = time.perf_counter() - t0
                    r = jnp.asarray(restored)
                    m = {
                        "time_s": round(elapsed, 3),
                        "gap_sdr_db": [round(float(x), 3) for x in gap_sdr(clean, r, gapm)],
                        "fwseg_snr_db": [round(float(x), 3) for x in fwseg_snr(clean, r)],
                    }
                    if per_iteration is not None:
                        m["gap_sdr_per_iter_db"] = per_iteration
                    entry["methods"][name] = m
                    print(
                        f"p={p_order} {est} gap={gap_ms}ms {name}: "
                        f"SDR {np.mean(m['gap_sdr_db']):.2f} dB ({elapsed:.1f}s)"
                    )

                record(
                    "extrapolation",
                    lambda: chunked(
                        lambda x, mm, s, l: arinpaint(
                            x, mm, s, l, order=p_order, context=args.w,
                            max_gap=max_gap, method=est,
                        )
                    )(gapped, tmask, gs, gl),
                )

                # Gap-wise Janssen with per-iteration SDR (train.m "saveall").
                from ml_audio_inpainting_tpu.classical.janssen import janssen

                ctx = args.w

                def gapwise_saveall():
                    pad = ctx + max_gap
                    seg_len = 2 * ctx + max_gap

                    def one(x, mm, s, l):
                        xp = jnp.pad(x, (pad, pad))
                        mp = jnp.pad(mm, (pad, pad), constant_values=1.0)
                        st = s - ctx + pad
                        seg = jax.lax.dynamic_slice(xp, (st,), (seg_len,))
                        sm = jax.lax.dynamic_slice(mp, (st,), (seg_len,))
                        hist = janssen(
                            seg, sm, jnp.asarray(ctx), l, p=p_order,
                            maxit=args.maxit, method=est, max_gap=max_gap,
                            saveall=True,
                        )  # (maxit, seg_len)
                        outs = jax.vmap(
                            lambda h: jax.lax.dynamic_update_slice(xp, h, (st,))[pad : pad + n]
                        )(hist)
                        return outs  # (maxit, n)

                    return chunked(one)(gapped, tmask, gs, gl)  # (B, maxit, n)

                t0 = time.perf_counter()
                hist = np.asarray(gapwise_saveall())
                elapsed = time.perf_counter() - t0
                per_iter = [
                    [
                        round(float(gap_sdr(clean[i], jnp.asarray(hist[i, it]), gapm[i])), 3)
                        for it in range(args.maxit)
                    ]
                    for i in range(B)
                ]
                final = jnp.asarray(hist[:, -1])
                entry["methods"]["janssen"] = {
                    "time_s": round(elapsed, 3),
                    "gap_sdr_db": [
                        round(float(x), 3) for x in gap_sdr(clean, final, gapm)
                    ],
                    "fwseg_snr_db": [round(float(x), 3) for x in fwseg_snr(clean, final)],
                    "gap_sdr_per_iter_db": per_iter,
                }
                print(
                    f"p={p_order} {est} gap={gap_ms}ms janssen: "
                    f"SDR {np.mean(entry['methods']['janssen']['gap_sdr_db']):.2f} dB ({elapsed:.1f}s)"
                )

                for wtype in ("hann", "rect", "tukey"):
                    record(
                        f"janssen_{wtype}",
                        lambda wt=wtype: chunked(
                            lambda x, mm, s, l: segmentation_inpaint(
                                x, mm, s, l, p=p_order, maxit=args.maxit,
                                method=est, wtype=wt, w=args.w, a=args.a,
                                max_gap=max_gap,
                            )
                        )(gapped, tmask, gs, gl),
                    )

                out_path.write_text(json.dumps(entry, indent=1))
                print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
