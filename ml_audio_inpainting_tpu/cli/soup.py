"""Weight-space model soup: average exported npz checkpoints.

``model soup`` averaging (Wortsman et al., 2022) of two or more
:func:`export_params_npz` artifacts from the SAME architecture — e.g.
different probe-selected steps of one training run, or sibling seed runs —
into a single deployable checkpoint:

    python -m ml_audio_inpainting_tpu.cli.soup out.npz a.npz b.npz \
        --weights 0.25 0.75

The output loads anywhere ``--checkpoint`` does (inpaint/evaluate).  All
floating leaves (params AND batch_stats: BatchNorm statistics are means, so
a convex combination is the exact statistic of the mixture) are averaged;
trees must match exactly — a leaf-shape or key mismatch aborts rather than
producing a silently broken soup.

No reference counterpart (the reference deploys single torch checkpoints);
measured on the two committed GAN generators in
``results/ensemble_soup.json``.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Average npz checkpoints (model soup)")
    p.add_argument("output", help="destination .npz")
    p.add_argument("inputs", nargs="+", help="two or more source .npz")
    p.add_argument(
        "--weights",
        type=float,
        nargs="+",
        default=None,
        help="convex weights, one per input (default: uniform); normalized "
        "to sum to 1",
    )
    p.add_argument(
        "--dtype",
        choices=["float16", "float32"],
        default="float16",
        help="export dtype (float16 = the commit-friendly default)",
    )
    return p


def soup_params(trees, weights=None):
    """Weighted average of matching pytrees (float leaves; others must be
    identical across inputs and pass through)."""
    if len(trees) < 2:
        raise ValueError("need at least two checkpoints to soup")
    n = len(trees)
    if weights is None:
        weights = [1.0 / n] * n
    if len(weights) != n:
        raise ValueError(f"{len(weights)} weights for {n} inputs")
    if any(x < 0 for x in weights):
        # The batch_stats-averaging argument in the module docstring only
        # holds for convex combinations (extrapolated BN variances can go
        # negative -> NaN at inference).
        raise ValueError("weights must be non-negative (convex soup)")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    w = [float(x) / total for x in weights]

    treedefs = [jax.tree_util.tree_structure(t) for t in trees]
    if any(td != treedefs[0] for td in treedefs[1:]):
        raise ValueError(
            "checkpoint trees differ in structure; soup requires the same "
            f"architecture export ({treedefs[0]} vs {treedefs[1:]})"
        )

    def avg(*leaves):
        first = np.asarray(leaves[0])
        if not np.issubdtype(first.dtype, np.floating):
            for other in leaves[1:]:
                if not np.array_equal(first, np.asarray(other)):
                    raise ValueError("non-float leaves differ across inputs")
            return leaves[0]
        shapes = {np.asarray(l).shape for l in leaves}
        if len(shapes) != 1:
            raise ValueError(f"leaf shape mismatch across inputs: {shapes}")
        return sum(wi * li for wi, li in zip(w, leaves))

    return jax.tree_util.tree_map(avg, *trees)


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.train.checkpoints import (
        export_params_npz,
        load_params_npz,
    )

    args = build_argparser().parse_args(argv)
    trees = [load_params_npz(p) for p in args.inputs]
    out = soup_params(trees, args.weights)
    export_params_npz(
        args.output, out, dtype=None if args.dtype == "float32" else args.dtype
    )
    print(f"souped {len(trees)} checkpoints -> {args.output}")


if __name__ == "__main__":
    main()
