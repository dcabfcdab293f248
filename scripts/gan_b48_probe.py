"""Probe whether GAN B=48 bf16 can beat the B=32 training record — safely.

The single-chip record is B=32 bf16 non-remat (4.18 steps/s = 669
s-audio/s; 12.04 GiB peak per the fused_g_forward study).  B=48 non-remat
extrapolates past the 16 GiB chip, but B=48 bf16 + remat might fit
(B=32 bf16+remat measured 9.6 GiB via memory_analysis) and remat's ~30%
FLOP tax could still net out ahead at 1.5x the batch.

OOM on this platform wedges the remote-compile relay for 10+ minutes
(CLAUDE.md), so this script NEVER executes blind: it AOT-compiles each
candidate and reads XLA's memory_analysis first; a candidate is run only
if its peak fits under a 14.5 GiB safety line.  Reference hot loop:
/root/reference/models/GAN/train.py:341-378.

Run from the repo root: python scripts/gan_b48_probe.py

STATUS (2026-08-19, round 4): attempted on the real chip; the B=48+remat
program's compile did not return within 15 minutes through the remote-
compile tunnel (B=32-shape compiles the same day took 250-390 s) and the
run was abandoned to protect the relay (killing it mid-compile wedged
the claim relay for the usual ~10 min).  Expected value was marginal
anyway: remat's measured ~30% tax * 1.5x batch extrapolates to ~703
s-audio/s vs the 669 record (+5%).  Kept in-tree as the safe (memory-
analysis-gated) way to re-try on a quiet relay day.
"""

import json
import os
import sys
import time

import numpy as np

# `python scripts/foo.py` puts scripts/ (not the repo root) at sys.path[0];
# PYTHONPATH=/root/repo breaks axon plugin registration (CLAUDE.md gotcha).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAFETY_GIB = 14.5


def main():
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
    from ml_audio_inpainting_tpu.models.vgg import vgg19_params
    from ml_audio_inpainting_tpu.train.gan_trainer import (
        create_gan_states,
        make_gan_train_step,
    )
    from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    cfg.data.max_len_s = 5.0
    clip_s = 5.0

    vgg_pack = vgg19_params()
    rows = []
    for batch, remat in ((48, True), (48, False)):
        ds = SyntheticSpeechDataset(n_items=batch, max_len_s=clip_s)
        audio = jnp.asarray(np.stack([ds[i] for i in range(batch)]))
        g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0))
        step = make_gan_train_step(
            cfg, vgg=vgg_pack, compute_dtype=jnp.bfloat16, remat=remat
        )
        key = jax.random.PRNGKey(0)

        t0 = time.perf_counter()
        compiled = (
            jax.jit(step).lower(g_state, d_state, audio, key).compile()
        )
        compile_s = time.perf_counter() - t0
        ma = compiled.memory_analysis()
        peak_gib = None
        if ma is not None:
            # peak = temp + argument + output (generated code size is noise)
            peak_gib = (
                getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
            ) / 2**30
        row = {
            "batch": batch,
            "remat": remat,
            "compile_s": round(compile_s, 1),
            "peak_gib": round(peak_gib, 2) if peak_gib is not None else None,
        }
        print(json.dumps(row), flush=True)

        if peak_gib is None or peak_gib > SAFETY_GIB:
            row["ran"] = False
            row["why"] = f"peak {peak_gib} GiB > safety line {SAFETY_GIB}"
            rows.append(row)
            print(f"SKIP run: {row['why']}", flush=True)
            continue

        g_state, d_state, m = compiled(g_state, d_state, audio, key)
        _ = float(m["g_total"])
        t0 = time.perf_counter()
        for _ in range(5):
            g_state, d_state, m = compiled(g_state, d_state, audio, key)
            _ = float(m["g_total"])
        dt = (time.perf_counter() - t0) / 5
        row.update(
            ran=True,
            steps_per_s=round(1 / dt, 3),
            s_audio_per_s=round(batch * clip_s / dt, 1),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "what": "GAN B=48 bf16 record probe, memory-analysis-gated (vs B=32 bf16 non-remat record 669 s-audio/s)",
        "measured": "2026-08-19 (round 4)",
        "safety_line_gib": SAFETY_GIB,
        "rows": rows,
    }
    with open("results/gan_b48_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/gan_b48_probe.json")


if __name__ == "__main__":
    main()
