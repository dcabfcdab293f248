"""CNN+BiLSTM model family: shapes, compositing, feature extraction, and a
short overfit run (the reference's own recipe: overfit a tiny corpus,
``cnn_blstm.yaml:12-13``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.models.cnn_blstm import StackedBLSTMCNN
from ml_audio_inpainting_tpu.ops.lstm import BiLSTM
from ml_audio_inpainting_tpu.train import features
from ml_audio_inpainting_tpu.train.cnn_trainer import (
    create_cnn_state,
    make_cnn_eval_step,
    make_cnn_train_step,
)
from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

CNN_SPEC = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)


def small_config() -> Config:
    cfg = Config()
    cfg.data.spectrogram = CNN_SPEC
    cfg.data.max_len_s = 1.0
    cfg.data.gap_len_s = 0.1
    cfg.data.gaps_per_audio = 2
    cfg.model.cnn_blstm.lstm_hidden_dim = 32
    cfg.model.cnn_blstm.num_lstm_layers = 1
    cfg.model.cnn_blstm.enc_filters = [4, 8]
    cfg.model.cnn_blstm.dec_filters = [4, 8]
    return cfg


class TestBiLSTM:
    def test_output_shape(self):
        m = BiLSTM(hidden_dim=16, num_layers=2)
        x = jnp.ones((3, 20, 8))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (3, 20, 32)

    def test_backward_direction_sees_future(self):
        """The backward half at t=0 must depend on input at t=T-1."""
        m = BiLSTM(hidden_dim=8, num_layers=1)
        x = jnp.zeros((1, 10, 4))
        params = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(params, x)
        x2 = x.at[0, -1, :].set(1.0)
        y1 = m.apply(params, x2)
        # forward half at t=0 unchanged, backward half changed
        assert np.allclose(np.asarray(y0[0, 0, :8]), np.asarray(y1[0, 0, :8]))
        assert not np.allclose(np.asarray(y0[0, 0, 8:]), np.asarray(y1[0, 0, 8:]))


class TestModel:
    def test_forward_shape_full_profile(self):
        """The production shape contract: (B, 257, 417) -> (B, 257, 417)."""
        model = StackedBLSTMCNN(freq_bins=257)
        x = jnp.zeros((1, 257, 417))
        variables = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(variables, x)
        assert y.shape == (1, 257, 417)

    def test_reconstruct_composites_gap_only(self):
        model = StackedBLSTMCNN(
            freq_bins=33, lstm_hidden_dim=16, num_lstm_layers=1,
            enc_filters=(4, 8), dec_filters=(4, 8),
        )
        x = jnp.ones((1, 33, 21)) * 0.5
        variables = model.init(jax.random.PRNGKey(0), x)
        gap_mask = jnp.zeros((1, 33, 21)).at[:, :, 5:9].set(1.0)  # 1 = gap
        out = model.reconstruct_spectrogram(variables, x, gap_mask)
        out = np.asarray(out)
        # outside the gap: untouched input
        np.testing.assert_array_equal(out[:, :, :5], 0.5)
        np.testing.assert_array_equal(out[:, :, 9:], 0.5)


class TestFeatures:
    def test_cnn_features_shapes_and_masks(self):
        audio = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16000)), jnp.float32)
        b = features.cnn_features(
            audio, jax.random.PRNGKey(0), CNN_SPEC,
            gap_len_s=0.1, sample_rate=16000, n_samples=16000, gaps_per_audio=3,
        )
        F, N = 257, 1 + 16000 // 192
        assert b["log_gap"].shape == (6, F, N)
        assert b["gap_mask"].shape == (6, F, N)
        assert b["target_mag"].shape == (6, F, N)
        # Masks are column-constant, 1 = gap, and variants differ.
        m = np.asarray(b["gap_mask"])
        assert set(np.unique(m)) <= {0.0, 1.0}
        assert (m.sum(axis=(1, 2)) > 0).all()
        assert not np.array_equal(m[0], m[1]) or not np.array_equal(m[1], m[2])
        # targets repeat per clip: items 0..2 share a target, 3..5 share another
        np.testing.assert_array_equal(np.asarray(b["target_mag"][0]), np.asarray(b["target_mag"][1]))

    def test_gan_features_shapes(self):
        spec = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
        audio = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16000)), jnp.float32)
        b = features.gan_features(
            audio, jax.random.PRNGKey(0), spec,
            gap_len_s=0.1, sample_rate=16000, n_samples=16000,
        )
        F, N = 257, 1 + 16000 // 128
        for k in ("original_magnitude", "impaired_magnitude", "mask", "original_phase"):
            assert b[k].shape == (2, F, N), k
        # GAN convention: 1 = valid, hole has zeros
        m = np.asarray(b["mask"])
        assert (m.sum(axis=(1, 2)) < 2 * F * N).all()

    def test_gan_features_multi_gap(self):
        """n_gaps > 1: IRMAS-style training corruption -- the frame mask
        must contain exactly that many distinct hole runs per clip."""
        spec = SpectrogramConfig(n_fft=256, hop_length=64, win_length=256)
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 16000)), jnp.float32
        )
        b = features.gan_features(
            audio, jax.random.PRNGKey(1), spec,
            gap_len_s=0.05, sample_rate=16000, n_samples=16000, n_gaps=3,
        )
        m = np.asarray(b["mask"])
        for clip in range(3):
            row = m[clip, 0]
            runs = int(np.sum(row[1:] < row[:-1])) + int(row[0] == 0)
            assert runs == 3, (clip, runs)

    def test_cnn_features_multi_gap(self):
        """CNN training variant of --train-n-gaps: each gap variant must
        carry n_gaps distinct hole runs (floor/floor rule per gap).
        Production clip length -- at short lengths the spacing budget
        shrinks gaps below a frame hop and floor/floor legitimately yields
        fewer runs."""
        spec = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 80000)), jnp.float32
        )
        b = features.cnn_features(
            audio, jax.random.PRNGKey(0), spec,
            gap_len_s=0.08, sample_rate=16000, n_samples=80000,
            gaps_per_audio=2, n_gaps=3,
        )
        m = np.asarray(b["gap_mask"])  # 1 = gap
        assert m.shape[0] == 2
        for i in range(2):
            row = m[i, 0]
            runs = int(np.sum(row[1:] > row[:-1])) + int(row[0] == 1)
            assert runs == 3, (i, runs)


class TestTraining:
    def test_loss_decreases_overfit(self, speech_like):
        cfg = small_config()
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        step = make_cnn_train_step(cfg)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        losses = []
        for i in range(30):
            state, metrics = step(state, audio, jax.random.PRNGKey(i % 4))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[::10]

    def test_eval_step_runs(self, speech_like):
        cfg = small_config()
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        ev = make_cnn_eval_step(cfg)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        out = ev(state, audio, jax.random.PRNGKey(0))
        assert np.isfinite(float(out["loss"]))

    def test_bf16_mixed_precision_step(self, speech_like):
        """compute_dtype=bf16 (VERDICT r3 #4, the GAN recipe applied to this
        family): master weights/Adam state/BatchNorm EMA stay f32, the step-1
        loss tracks the f32 step, and repeated steps learn."""
        cfg = small_config()
        audio = jnp.asarray(speech_like[:16000])[None, :]

        s32 = create_cnn_state(cfg, jax.random.PRNGKey(0))
        step32 = make_cnn_train_step(cfg)
        s32_1, m32 = step32(s32, audio, jax.random.PRNGKey(0))

        s16 = create_cnn_state(cfg, jax.random.PRNGKey(0))
        step16 = make_cnn_train_step(cfg, compute_dtype=jnp.bfloat16)
        losses = []
        for i in range(20):
            s16, m16 = step16(s16, audio, jax.random.PRNGKey(i % 4))
            losses.append(float(m16["loss"]))
            assert np.isfinite(losses[-1])
            if i == 0:
                # Same PRNG stream -> same gaps; bf16 forward lands within
                # a few percent of the f32 loss on step 1.
                assert abs(losses[0] - float(m32["loss"])) < 0.05 * abs(
                    float(m32["loss"])
                ), (losses[0], float(m32["loss"]))
                # BatchNorm running stats accumulate in f32 (the stats are
                # deliberately not cast; the running-average update promotes
                # the bf16 batch moments back to f32).
                for a, b in zip(
                    jax.tree_util.tree_leaves(s16.batch_stats),
                    jax.tree_util.tree_leaves(s32_1.batch_stats),
                ):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
                    )
        assert losses[-1] < losses[0] * 0.8, losses[::5]

        # Master state stays f32 end to end.
        for leaf in jax.tree_util.tree_leaves(
            (s16.params, s16.opt_state, s16.batch_stats)
        ):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype

    def test_ema_disabled_by_default(self):
        state = create_cnn_state(small_config(), jax.random.PRNGKey(0))
        assert state.ema_params is None

    def test_ema_is_exact_blend_of_live_trajectory(self, speech_like):
        """--ema: after each step, ema == decay*ema_prev + (1-decay)*params
        (same contract as the GAN trainer's g_ema; no reference
        counterpart -- the reference serves raw live weights)."""
        decay = 0.5
        cfg = small_config()
        state = create_cnn_state(cfg, jax.random.PRNGKey(0), ema=decay)
        assert state.ema_params is not None
        step = make_cnn_train_step(cfg, ema=decay)
        audio = jnp.asarray(speech_like[:16000])[None, :]

        expect = jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))
        for i in range(3):
            state, _ = step(state, audio, jax.random.PRNGKey(i))
            live = jax.device_get(state.params)
            expect = jax.tree_util.tree_map(
                lambda e, p: decay * e + (1 - decay) * np.asarray(p), expect, live
            )
        got = jax.device_get(state.ema_params)
        for e, g in zip(
            jax.tree_util.tree_leaves(expect), jax.tree_util.tree_leaves(got)
        ):
            np.testing.assert_allclose(e, np.asarray(g), rtol=1e-5, atol=1e-6)
        diffs = [
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree_util.tree_leaves(got),
                jax.tree_util.tree_leaves(jax.device_get(state.params)),
            )
        ]
        assert max(diffs) > 0
