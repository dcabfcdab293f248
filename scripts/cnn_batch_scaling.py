"""CNN+BiLSTM train-step batch scaling on the real TPU.

Question: the BiLSTM scan is latency-bound (results/profiles/README.md:
per-scan-step time is dominated by fixed overhead, not the tiny recurrent
matmul), so s-audio/s should keep climbing with batch well past the bench's
B=32.  Measures steps/s and s-audio/s at B in {32, 64, 128, 256} for bf16 (the
recipe dtype) and f32 at B=64, with device-resident inputs (no host feed in
the timed loop).  Reference hot loop this studies:
/root/reference/models/CNNBLSTM/train.py:83-121.

Run from the repo root: python scripts/cnn_batch_scaling.py
Optionally pass row specs (e.g. `256:bf16 64:f32`) to run a subset; rows are
merged into the existing results JSON by (batch, dtype).
"""

import json
import os
import sys
import time

import numpy as np

# `python scripts/foo.py` puts scripts/ (not the repo root) at sys.path[0];
# PYTHONPATH=/root/repo breaks axon plugin registration (CLAUDE.md gotcha).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
    from ml_audio_inpainting_tpu.train.cnn_trainer import (
        create_cnn_state,
        make_cnn_train_step,
    )
    from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)
    cfg.data.max_len_s = 5.0
    clip_s = 5.0

    state0 = create_cnn_state(cfg, jax.random.PRNGKey(0))
    all_specs = (
        (32, "bf16", jnp.bfloat16),
        (64, "bf16", jnp.bfloat16),
        (128, "bf16", jnp.bfloat16),
        (256, "bf16", jnp.bfloat16),
        (64, "f32", None),
    )
    if len(sys.argv) > 1:
        want = {
            (int(s.split(":")[0]), s.split(":")[1]) for s in sys.argv[1:]
        }
        specs = [s for s in all_specs if (s[0], s[1]) in want]
    else:
        specs = list(all_specs)

    rows = []
    for batch, dtype_tag, compute_dtype in specs:
        ds = SyntheticSpeechDataset(n_items=batch, max_len_s=clip_s)
        audio = jnp.asarray(np.stack([ds[i] for i in range(batch)]))
        step = make_cnn_train_step(cfg, compute_dtype=compute_dtype)
        key = jax.random.PRNGKey(0)

        state = state0
        t0 = time.perf_counter()
        state, metrics = step(state, audio, key)
        _ = float(metrics["loss"])  # fetch a scalar: forces completion on axon
        compile_s = time.perf_counter() - t0

        # settle, then time 5 steps (fetch the loss scalar each step --
        # block_until_ready does not block on this platform)
        t0 = time.perf_counter()
        for _ in range(5):
            state, metrics = step(state, audio, key)
            _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / 5
        row = {
            "batch": batch,
            "dtype": dtype_tag,
            "steps_per_s": round(1.0 / dt, 3),
            "s_audio_per_s": round(batch * clip_s / dt, 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    path = "results/cnn_batch_scaling.json"
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
        merged = {(r["batch"], r["dtype"]): r for r in out.get("rows", [])}
        for r in rows:
            merged[(r["batch"], r["dtype"])] = r
        out["rows"] = sorted(
            merged.values(), key=lambda r: (r["dtype"], r["batch"])
        )
    else:
        out = {
            "what": "CNN+BiLSTM fused train step batch scaling, device-resident inputs, TPU v5e 1 chip",
            "measured": "2026-08-19 (round 4)",
            "rows": rows,
            "note": "bench.py's cnn lines run B=32 (5.92 f32 / 8.92 bf16 steps/s in the round-4 capture).",
        }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
