"""Profile the GAN two-optimizer train step at the record config (B=32 bf16).

Captures a 3-step jax.profiler trace of the production step (full VGG
objective, device-resident inputs — the `--feed device --train-dtype bf16
--batch-size 32` recipe that holds the single-chip training record) and
writes a reproducible top-op breakdown parsed from the trace, so the
30%-MFU ceiling argument rests on a committed artifact at the record
config rather than the round-2 B=4 trace.  Reference hot loop this step
replaces: /root/reference/models/GAN/train.py:341-378.

Run from the repo root: python scripts/gan_b32_profile.py
Outputs: results/profiles/gan_train_b32_bf16/ (trace) + top_ops.json.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

# `python scripts/foo.py` puts scripts/ (not the repo root) at sys.path[0];
# PYTHONPATH=/root/repo breaks axon plugin registration (CLAUDE.md gotcha).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_DIR = "results/profiles/gan_train_b32_bf16"


def parse_trace(log_dir: str):
    """Aggregate device-lane event durations from the newest trace file."""
    paths = sorted(
        glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # pid -> process name (trace metadata)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")

    # Device lanes: anything that isn't the python/host side. The axon
    # platform names its device process like a TPU/device lane; fall back
    # to "every non-python pid" if no explicit device lane is found.
    def is_device(pid):
        name = pid_names.get(pid, "").lower()
        return any(k in name for k in ("tpu", "device", "xla", "axon"))

    device_pids = {p for p in pid_names if is_device(p)}
    per_op = defaultdict(float)
    per_pid = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        per_pid[pid] += e["dur"]
        if not device_pids or pid in device_pids:
            per_op[e["name"]] += e["dur"]

    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    lanes = {
        f"{pid} ({pid_names.get(pid, '?')})": round(us / 1e3, 2)
        for pid, us in sorted(per_pid.items(), key=lambda kv: -kv[1])[:8]
    }
    return {
        "trace_file": paths[-1],
        "lane_totals_ms": lanes,
        "top_ops_ms": {name: round(us / 1e3, 3) for name, us in top},
    }


def main():
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
    from ml_audio_inpainting_tpu.models.vgg import vgg19_params
    from ml_audio_inpainting_tpu.runtime.profiling import trace
    from ml_audio_inpainting_tpu.train.gan_trainer import (
        create_gan_states,
        make_gan_train_step,
    )
    from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    cfg.data.max_len_s = 5.0
    batch, clip_s = 32, 5.0

    ds = SyntheticSpeechDataset(n_items=batch, max_len_s=clip_s)
    audio = jnp.asarray(np.stack([ds[i] for i in range(batch)]))
    vgg_pack = vgg19_params()
    g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0))
    step = make_gan_train_step(cfg, vgg=vgg_pack, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    g_state, d_state, m = step(g_state, d_state, audio, key)
    _ = float(m["g_total"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        g_state, d_state, m = step(g_state, d_state, audio, key)
        _ = float(m["g_total"])
    dt = (time.perf_counter() - t0) / 5
    print(f"warm: {1/dt:.2f} steps/s = {batch*clip_s/dt:.0f} s-audio/s", flush=True)

    with trace(LOG_DIR):
        for _ in range(3):
            g_state, d_state, m = step(g_state, d_state, audio, key)
            _ = float(m["g_total"])

    summary = parse_trace(LOG_DIR)
    if summary is None:
        print("no trace file produced", flush=True)
        return
    summary["config"] = {
        "batch": batch,
        "dtype": "bf16",
        "steps_traced": 3,
        "warm_steps_per_s": round(1 / dt, 3),
        "s_audio_per_s": round(batch * clip_s / dt, 1),
    }
    out = os.path.join(LOG_DIR, "top_ops.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["lane_totals_ms"], indent=1))
    for name, ms in list(summary["top_ops_ms"].items())[:12]:
        print(f"{ms:10.3f} ms  {name[:90]}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
