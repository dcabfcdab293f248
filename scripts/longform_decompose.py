"""Decompose the long-form serving wall time (VERDICT r4 #5).

Round 4's longform TPU line (208 s-audio/s) sat 4.4x below the same-day
canonical 909 with no accounting.  This script times every stage of the
long-form pass separately on the live backend -- chunk, gather, model
call (at both the reuse-canonical batch 32 and the right-sized batch 8),
scatter, OLA, the full-waveform f32 fetch, and the round-5 fused
epilogue + gap-patch fetch -- and writes the attribution to
``results/longform_decomposition.json``.

Each stage time includes its dispatch round trip (the stages run
eagerly-sequentially in the serving loop, so per-stage wall time WITH the
~28 ms tunnel RTT is the honest decomposition).  Completion barrier is a
1-element reduction fetch (axon ``block_until_ready`` returns early) or
the stage's own host materialization where the fetch IS the stage.

Run from the repo root: ``python scripts/longform_decompose.py``.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# `python scripts/foo.py` puts scripts/ (not the repo root) at sys.path[0];
# make the package importable either way.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, iters=5):
    fn()  # warmup/compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
    from ml_audio_inpainting_tpu.runtime import longform as lf
    from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
    from ml_audio_inpainting_tpu.train.gan_trainer import build_generator
    from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    cfg.data.max_len_s = 5.0
    gen = build_generator(cfg)
    variables = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 257, 626)), jnp.ones((1, 257, 626)),
        train=False,
    )
    fn = make_gan_inpaint_fn(cfg, gen)  # parity: the round-4 longform line's fn
    fn_enh = make_gan_inpaint_fn(cfg, gen, mode="enhanced")

    reduce_fn = jax.jit(jnp.sum)

    def settle(x):
        np.asarray(reduce_fn(x))

    long_s, window, hop = 60.0, 80000, 40000
    ds = SyntheticSpeechDataset(n_items=1, max_len_s=long_s)
    audio = jnp.asarray(np.asarray(ds[0]))
    gs = np.asarray([200000, 480000, 760000])
    gl = np.full(3, 1280)
    t = int(audio.shape[-1])

    out = {"condition": {
        "clip_s": long_s, "n_gaps": 3, "window": window, "hop": hop,
        "platform": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
    }, "stages_ms": {}}

    # --- stage timings (each includes its dispatch RTT) ---
    windows, _ = lf.chunk_signal(audio, window, hop)
    out["stages_ms"]["chunk"] = 1000 * _timeit(
        lambda: settle(lf._chunk(audio, window, hop)))

    # the 3-gap condition selects 6 windows (2 per gap at hop=window/2)
    sel = jnp.asarray([4, 5, 11, 12, 18, 19], jnp.int32)
    out["stages_ms"]["gather_pad32"] = 1000 * _timeit(
        lambda: settle(lf._gather_pad(windows, sel, 26)))
    out["stages_ms"]["gather_pad8"] = 1000 * _timeit(
        lambda: settle(lf._gather_pad(windows, sel, 2)))

    bw32 = lf._gather_pad(windows, sel, 26)
    bw8 = lf._gather_pad(windows, sel, 2)
    ls = jnp.zeros((32,), jnp.int32)
    ll = jnp.full((32,), 1280, jnp.int32)
    out["stages_ms"]["model_b32"] = 1000 * _timeit(
        lambda: settle(fn(variables, bw32, ls, ll)[0]))
    out["stages_ms"]["model_b8"] = 1000 * _timeit(
        lambda: settle(fn_enh(variables, bw8, ls[:8], ll[:8])[0]))

    restored32, _ = fn(variables, bw32, ls, ll)
    out["stages_ms"]["scatter"] = 1000 * _timeit(
        lambda: settle(lf._scatter(windows, sel, restored32)))

    scattered = lf._scatter(windows, sel, restored32)
    out["stages_ms"]["ola"] = 1000 * _timeit(
        lambda: settle(lf._ola(scattered, hop, t)))

    ola = lf._ola(scattered, hop, t)
    out["stages_ms"]["fetch_full_f32"] = 1000 * _timeit(lambda: np.asarray(ola))

    # round-5 fused epilogue + patch fetch
    restored8, _ = fn_enh(variables, bw8, ls[:8], ll[:8])

    def fused():
        p, s = lf._finalize_patches(
            windows, sel, restored8[:6], audio,
            jnp.asarray(gs, jnp.int32), jnp.asarray(gl, jnp.int32),
            hop, t, 2048,
        )
        np.asarray(s)
        np.asarray(p)

    out["stages_ms"]["finalize_patches_incl_fetch"] = 1000 * _timeit(fused)

    # --- end-to-end, both paths ---
    def old_path():
        np.asarray(lf.longform_inpaint(
            fn, variables, audio, gs, gl, window=window, hop=hop,
            batch_size=32, pad_batches=True))

    def new_path():
        p, s = lf.longform_inpaint(
            fn_enh, variables, audio, gs, gl, window=window, hop=hop,
            batch_size=8, pad_batches=True, gap_fetch=2048)
        np.asarray(s); np.asarray(p)

    dt_old = _timeit(old_path)
    dt_new = _timeit(new_path)
    out["end_to_end"] = {
        "round4_path_ms": 1000 * dt_old,
        "round4_s_audio_per_s": long_s / dt_old,
        "round5_path_ms": 1000 * dt_new,
        "round5_s_audio_per_s": long_s / dt_new,
    }
    for k in out["stages_ms"]:
        out["stages_ms"][k] = round(out["stages_ms"][k], 2)
    for k in out["end_to_end"]:
        out["end_to_end"][k] = round(out["end_to_end"][k], 2)

    path = Path(__file__).resolve().parents[1] / "results" / "longform_decomposition.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
