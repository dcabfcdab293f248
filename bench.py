"""Benchmark: seconds of audio inpainted per second per chip.

Runs the flagship end-to-end inference pipeline -- gapped waveform -> STFT ->
PConv U-Net generator -> iSTFT reconstruction -- as one jitted XLA program on
the available accelerator, batched over 5 s / 16 kHz clips (the reference's
``models/model_eval.py`` serve path, BASELINE.json config #4).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 100, i.e. the multiple of the BASELINE.json
north-star target of >=100x realtime per chip (the reference records no
throughput numbers of its own -- BASELINE.md).
"""

import json
import time

import numpy as np


def main() -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # persistent compile cache; honors JAX_PLATFORMS
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.models.pconv_unet import PConvUNet
    from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
    from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig
    from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
    from ml_audio_inpainting_tpu.train.gan_trainer import build_generator

    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    cfg.data.max_len_s = 5.0

    batch = 32  # best measured batch for single-chip HBM (B=64 exceeds 16G)
    clip_s = cfg.data.max_len_s
    ds = SyntheticSpeechDataset(n_items=batch, max_len_s=clip_s)
    audio = jnp.asarray(np.stack([ds[i] for i in range(batch)]))
    gap_start = jnp.full((batch,), 32000, jnp.int32)
    gap_len = jnp.full((batch,), 1280, jnp.int32)  # 80 ms eval gap

    gen = build_generator(cfg)
    variables = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 257, 626)),
        jnp.ones((1, 257, 626)),
        train=False,
    )
    fn = make_gan_inpaint_fn(cfg, gen)

    # Warmup / compile.  NOTE: on the tunneled axon platform
    # ``block_until_ready`` returns before execution completes, so every
    # timed iteration materializes the output on the host (np.asarray) --
    # this measures honest end-to-end serving latency including the
    # device->host audio transfer.
    restored, _ = fn(variables, audio, gap_start, gap_len)
    np.asarray(restored)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        restored, _ = fn(variables, audio, gap_start, gap_len)
        np.asarray(restored)
    elapsed = time.perf_counter() - t0

    audio_seconds = batch * clip_s * iters
    value = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_seconds_inpainted_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "s_audio/s/chip",
                "vs_baseline": round(value / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
