"""Profile the canonical GAN serving graph (B=32 f32 enhanced, one chip).

Round 5 made the canonical serving number compute-bound (gap-only PCM16
transport put it within ~4% of the device-only rate), which makes the
compiled serving program itself the ceiling.  This captures a 3-forward
jax.profiler trace of exactly that program — STFT -> PConv U-Net ->
iSTFT -> composite on the committed headline checkpoint — and writes the
same top-op breakdown the training record has
(results/profiles/gan_train_b32_bf16/top_ops.json), so "no hot op left"
claims about serving rest on a committed artifact too.  Reference serving
loop this replaces: /root/reference/models/model_eval.py:101-143.

Run from the repo root: python scripts/gan_serving_profile.py
Outputs: results/profiles/gan_serving_b32/ (trace) + top_ops.json.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Reuse the trace parser from the training profile script (scripts/ is not
# a package; load by path).
_spec = importlib.util.spec_from_file_location(
    "gan_b32_profile", os.path.join(REPO, "scripts", "gan_b32_profile.py")
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
parse_trace = _mod.parse_trace

LOG_DIR = "results/profiles/gan_serving_b32"


def main():
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
    from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
    from ml_audio_inpainting_tpu.runtime.profiling import trace
    from ml_audio_inpainting_tpu.train.checkpoints import load_params_npz
    from ml_audio_inpainting_tpu.train.gan_trainer import build_generator
    from ml_audio_inpainting_tpu.utils.config import gan_profile_config

    cfg = gan_profile_config(None)
    batch, clip_s, sr = 32, 5.0, 16000

    ds = SyntheticSpeechDataset(n_items=batch, max_len_s=clip_s)
    audio = jnp.asarray(np.stack([ds[i] for i in range(batch)]))
    gs = jnp.full((batch,), int(2.0 * sr), jnp.int32)
    gl = jnp.full((batch,), int(0.08 * sr), jnp.int32)

    model = build_generator(cfg)
    variables = load_params_npz(
        os.path.join(REPO, "results/checkpoints/gan_formant_v2_r2.npz")
    )
    fn = make_gan_inpaint_fn(cfg, model, mode="enhanced")

    def device_only():
        restored, _ = fn(variables, audio, gs, gl)
        # Materialize a scalar: axon's block_until_ready does not block
        # (CLAUDE.md), so reduce on device and fetch the scalar.
        return float(jnp.sum(restored[:, 0]))

    t0 = time.perf_counter()
    device_only()
    print(f"compile+first forward: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        device_only()
    dt = (time.perf_counter() - t0) / 5
    print(f"warm: {batch * clip_s / dt:.0f} s-audio/s device-only", flush=True)

    with trace(LOG_DIR):
        for _ in range(3):
            device_only()

    summary = parse_trace(LOG_DIR)
    if summary is None:
        print("no trace file produced", flush=True)
        return
    summary["config"] = {
        "batch": batch,
        "dtype": "f32",
        "mode": "enhanced",
        "checkpoint": "gan_formant_v2_r2.npz",
        "forwards_traced": 3,
        "device_only_s_audio_per_s": round(batch * clip_s / dt, 1),
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
