"""Plot classical-benchmark results: SDR vs AR order by method, with
bootstrap confidence bands.

Reference: ``models/AudioReg/plotting/*.m`` (569 LoC of MATLAB loading
``results_01..10.mat`` and plotting SDR/PEMO-Q/PEAQ by method and AR order
with ``bootstrap_est`` CIs).  Input here is the ``results_*.json`` files
written by ``mai-ar-benchmark``.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Plot AR benchmark results")
    p.add_argument("--results-dir", default="./ar_results")
    p.add_argument("--metric", default="gap_sdr_db", choices=["gap_sdr_db", "fwseg_snr_db"])
    p.add_argument("--estimator", default=None, help="filter: lpc | arburg")
    p.add_argument("--output", default="ar_results.png")
    p.add_argument("--per-iteration", action="store_true",
                   help="also plot janssen SDR vs iteration for each order")
    p.add_argument("--scatter", nargs=2, metavar=("METHOD_X", "METHOD_Y"),
                   default=None,
                   help="per-signal scatter of one method against another "
                        "(maintest_scatter.m equivalent)")
    return p


def load_results(results_dir: Path):
    results = []
    for f in sorted(results_dir.glob("results_*.json")):
        results.append(json.loads(f.read_text()))
    if not results:
        raise SystemExit(f"no results_*.json under {results_dir}")
    return results


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ml_audio_inpainting_tpu.utils.stats import bootstrap_ci, fill_interval

    args = build_argparser().parse_args(argv)
    results = load_results(Path(args.results_dir))

    # metric[method][order] -> per-signal values
    by_method = defaultdict(dict)
    for entry in results:
        if args.estimator and entry["estimator"] != args.estimator:
            continue
        for method, m in entry["methods"].items():
            by_method[method][entry["p"]] = np.asarray(m[args.metric])

    fig, ax = plt.subplots(figsize=(8, 5))
    for method, by_order in sorted(by_method.items()):
        orders = sorted(by_order)
        means, los, his = [], [], []
        for p in orders:
            mean, lo, hi = bootstrap_ci(by_order[p][:, None])
            means.append(float(mean[0]))
            los.append(float(lo[0]))
            his.append(float(hi[0]))
        fill_interval(ax, orders, means, los, his, label=method)
    ax.set_xlabel("AR order p")
    ax.set_ylabel(args.metric)
    ax.set_xscale("log", base=2)
    ax.legend()
    ax.set_title(f"Classical inpainting: {args.metric} vs AR order")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")

    if args.scatter:
        mx, my = args.scatter
        fig3, ax3 = plt.subplots(figsize=(6, 6))
        for entry in results:
            if args.estimator and entry["estimator"] != args.estimator:
                continue
            if mx not in entry["methods"] or my not in entry["methods"]:
                continue
            xs = entry["methods"][mx][args.metric]
            ys = entry["methods"][my][args.metric]
            ax3.scatter(xs, ys, label=f"p={entry['p']} {entry['estimator']}", alpha=0.7)
        lims = ax3.get_xlim() + ax3.get_ylim()
        lo, hi = min(lims), max(lims)
        ax3.plot([lo, hi], [lo, hi], "k--", linewidth=0.8)  # y = x reference
        ax3.set_xlabel(f"{mx} {args.metric}")
        ax3.set_ylabel(f"{my} {args.metric}")
        ax3.legend()
        ax3.set_title(f"Per-signal {args.metric}: {my} vs {mx}")
        out3 = Path(args.output).with_suffix(".scatter.png")
        fig3.tight_layout()
        fig3.savefig(out3, dpi=120)
        print(f"wrote {out3}")

    if args.per_iteration:
        fig2, ax2 = plt.subplots(figsize=(8, 5))
        for entry in results:
            if args.estimator and entry["estimator"] != args.estimator:
                continue
            per_iter = entry["methods"].get("janssen", {}).get("gap_sdr_per_iter_db")
            if per_iter:
                arr = np.asarray(per_iter)  # (signals, iters)
                ax2.plot(
                    1 + np.arange(arr.shape[1]), arr.mean(axis=0),
                    label=f"p={entry['p']} {entry['estimator']}",
                )
        ax2.set_xlabel("Janssen iteration")
        ax2.set_ylabel("gap SDR (dB)")
        ax2.legend()
        out2 = Path(args.output).with_suffix(".iters.png")
        fig2.tight_layout()
        fig2.savefig(out2, dpi=120)
        print(f"wrote {out2}")


if __name__ == "__main__":
    main()
