"""End-to-end inference path + checkpoint round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.runtime.inference import (
    make_cnn_inpaint_fn,
    make_gan_inpaint_fn,
)
from ml_audio_inpainting_tpu.train.checkpoints import CheckpointManager
from ml_audio_inpainting_tpu.train.cnn_trainer import (
    build_model,
    create_cnn_state,
    make_cnn_train_step,
)
from ml_audio_inpainting_tpu.train.gan_trainer import build_generator, create_gan_states
from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig


def tiny_cfg(gan: bool) -> Config:
    cfg = Config()
    cfg.data.max_len_s = 1.0
    cfg.data.gap_len_s = 0.08
    if gan:
        cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
        cfg.model.generator.enc_layer_cfg = [(8, 7, 2), (16, 5, 2), (16, 3, 2)]
        cfg.model.generator.dec_layer_cfg = [(16, 3, 1), (8, 3, 1)]
        cfg.model.generator.final_interim_ch = 8
        cfg.model.discriminator.layer_cfg = [(8, 2)]
    else:
        cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)
        cfg.model.cnn_blstm.lstm_hidden_dim = 32
        cfg.model.cnn_blstm.num_lstm_layers = 1
        cfg.model.cnn_blstm.enc_filters = [4, 8]
        cfg.model.cnn_blstm.dec_filters = [4, 8]
    return cfg


class TestGANInference:
    def _setup(self):
        cfg = tiny_cfg(gan=True)
        gen = build_generator(cfg)
        F = cfg.data.spectrogram.freq_bins
        T = cfg.data.spectrogram.frames(cfg.data.max_samples)
        variables = gen.init(
            jax.random.PRNGKey(0), jnp.zeros((1, F, T)), jnp.ones((1, F, T)), train=False
        )
        return cfg, gen, variables

    def test_parity_mode_shapes(self, speech_like):
        cfg, gen, variables = self._setup()
        fn = make_gan_inpaint_fn(cfg, gen, mode="parity")
        audio = jnp.asarray(speech_like[:16000])[None, :]
        restored, spec = fn(
            variables, audio, jnp.asarray([4000]), jnp.asarray([1280])
        )
        assert restored.shape == (1, 16000)
        assert np.all(np.isfinite(np.asarray(restored)))

    def test_enhanced_mode_preserves_signal_outside_gap(self, speech_like):
        """Enhanced mode composites: audio away from the gap must survive
        nearly unchanged (iSTFT of untouched STFT frames)."""
        cfg, gen, variables = self._setup()
        fn = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
        audio = jnp.asarray(speech_like[:16000])[None, :]
        restored, _ = fn(variables, audio, jnp.asarray([8000]), jnp.asarray([1280]))
        r = np.asarray(restored[0])
        a = np.asarray(audio[0])
        # far from the gap (> 1 frame away from hole frames)
        np.testing.assert_allclose(r[:6000], a[:6000], atol=5e-3)
        np.testing.assert_allclose(r[12000:], a[12000:], atol=5e-3)

    @pytest.mark.parametrize("phase", ["impaired", "griffinlim"])
    def test_deployable_phase_regimes(self, speech_like, phase):
        """No-phase-oracle regimes: finite output, and the time-domain
        composite keeps every sample outside the gap EXACTLY untouched
        (SURVEY.md §2.7 compositing rule)."""
        cfg, gen, variables = self._setup()
        fn = make_gan_inpaint_fn(cfg, gen, mode="enhanced", phase=phase, gl_iters=4)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        restored, _ = fn(variables, audio, jnp.asarray([8000]), jnp.asarray([1280]))
        r = np.asarray(restored[0])
        a = np.asarray(audio[0])
        assert np.all(np.isfinite(r))
        np.testing.assert_array_equal(r[:8000], a[:8000])
        np.testing.assert_array_equal(r[9280:], a[9280:])
        assert not np.array_equal(r[8000:9280], a[8000:9280])

    def test_phase_validation(self):
        cfg, gen, _ = self._setup()
        with pytest.raises(ValueError, match="phase"):
            make_gan_inpaint_fn(cfg, gen, phase="bogus")

    def test_parity_rejects_non_oracle_phase(self):
        """Griffin-Lim/extrapolation over parity's log1p-domain "magnitude"
        is meaningless -- both GAN factories must fail fast."""
        from ml_audio_inpainting_tpu.runtime.inference import (
            make_gan_inpaint_mask_fn,
        )

        cfg, gen, _ = self._setup()
        with pytest.raises(ValueError, match="enhanced"):
            make_gan_inpaint_fn(cfg, gen, mode="parity", phase="griffinlim")
        with pytest.raises(ValueError, match="enhanced"):
            make_gan_inpaint_mask_fn(cfg, gen, mode="parity", phase="impaired")


class TestTTAShiftEnsemble:
    """make_tta_shift_fn: sub-hop shift ensembling (no reference
    counterpart -- model_eval.py runs one alignment)."""

    def _setup(self):
        cfg = tiny_cfg(gan=True)
        gen = build_generator(cfg)
        F = cfg.data.spectrogram.freq_bins
        T = cfg.data.spectrogram.frames(cfg.data.max_samples)
        variables = gen.init(
            jax.random.PRNGKey(0), jnp.zeros((1, F, T)), jnp.ones((1, F, T)), train=False
        )
        return cfg, gen, variables

    def test_single_shift_matches_base_in_gap(self, speech_like):
        from ml_audio_inpainting_tpu.runtime.inference import make_tta_shift_fn

        cfg, gen, variables = self._setup()
        base = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
        tta = make_tta_shift_fn(base, cfg.data.spectrogram.hop_length, 1)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        gs, gl = jnp.asarray([8000]), jnp.asarray([1280])
        rb, _ = base(variables, audio, gs, gl)
        rt, _ = tta(variables, audio, gs, gl)
        np.testing.assert_allclose(
            np.asarray(rt[0, 8000:9280]), np.asarray(rb[0, 8000:9280]),
            rtol=1e-5, atol=1e-6,
        )

    def test_ensemble_preserves_outside_and_differs_inside(self, speech_like):
        from ml_audio_inpainting_tpu.runtime.inference import make_tta_shift_fn

        cfg, gen, variables = self._setup()
        base = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
        tta = make_tta_shift_fn(base, cfg.data.spectrogram.hop_length, 4)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        gs, gl = jnp.asarray([8000]), jnp.asarray([1280])
        rt, _ = tta(variables, audio, gs, gl)
        rb, _ = base(variables, audio, gs, gl)
        r, a = np.asarray(rt[0]), np.asarray(audio[0])
        assert np.all(np.isfinite(r))
        # exact time-domain composite outside the gap
        np.testing.assert_array_equal(r[:8000], a[:8000])
        np.testing.assert_array_equal(r[9280:], a[9280:])
        # the ensemble genuinely mixes different alignments
        assert not np.allclose(r[8000:9280], np.asarray(rb[0, 8000:9280]))

    def test_rejects_zero_shifts(self):
        from ml_audio_inpainting_tpu.runtime.inference import make_tta_shift_fn

        cfg, gen, _ = self._setup()
        base = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
        with pytest.raises(ValueError, match="n_shifts"):
            make_tta_shift_fn(base, cfg.data.spectrogram.hop_length, 0)


class TestCNNInference:
    def test_shapes_and_outside_gap(self, speech_like):
        cfg = tiny_cfg(gan=False)
        model = build_model(cfg)
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fn = make_cnn_inpaint_fn(cfg, model)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        restored, _ = fn(variables, audio, jnp.asarray([8000]), jnp.asarray([1280]))
        assert restored.shape == (1, 16000)
        r = np.asarray(restored[0])
        a = np.asarray(audio[0])
        np.testing.assert_allclose(r[:6000], a[:6000], atol=5e-3)

    @pytest.mark.parametrize("phase", ["impaired", "griffinlim"])
    def test_deployable_phase_regimes(self, speech_like, phase):
        cfg = tiny_cfg(gan=False)
        model = build_model(cfg)
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fn = make_cnn_inpaint_fn(cfg, model, phase=phase, gl_iters=4)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        restored, _ = fn(variables, audio, jnp.asarray([8000]), jnp.asarray([1280]))
        r = np.asarray(restored[0])
        a = np.asarray(audio[0])
        assert np.all(np.isfinite(r))
        np.testing.assert_array_equal(r[:8000], a[:8000])
        np.testing.assert_array_equal(r[9280:], a[9280:])


class TestCheckpoints:
    def test_save_restore_roundtrip(self, tmp_path, speech_like):
        cfg = tiny_cfg(gan=False)
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        step = make_cnn_train_step(cfg)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        for i in range(3):
            state, _ = step(state, audio, jax.random.PRNGKey(i))

        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save(3, jax.device_get(state), force=True)
        mgr.wait()
        assert mgr.latest_step() == 3

        template = create_cnn_state(cfg, jax.random.PRNGKey(42))
        restored = mgr.restore(template)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == 3
        mgr.close()

    def test_npz_export_roundtrip(self, tmp_path):
        """Compact weight export (export_params_npz) restores the same tree
        structure with f16-rounding-level accuracy."""
        from ml_audio_inpainting_tpu.train.checkpoints import (
            export_params_npz,
            load_params_npz,
        )

        cfg = tiny_cfg(gan=False)
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        path = tmp_path / "weights.npz"
        export_params_npz(path, variables)
        loaded = load_params_npz(path)
        flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(loaded)[0]
        assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
        for (_, a), (_, b) in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
            )

    def test_restore_missing_raises(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "empty")
        with pytest.raises(FileNotFoundError):
            mgr.restore(template={"x": np.zeros(3)})
        mgr.close()

    def test_incremental_saves_keep_latest(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        for s in (1, 2, 3):
            mgr.save(s, {"w": np.full((4,), float(s))}, force=True)
        mgr.wait()
        assert mgr.latest_step() == 3
        out = mgr.restore({"w": np.zeros(4)})
        np.testing.assert_array_equal(out["w"], np.full((4,), 3.0))
        mgr.close()


class TestCheckpointRouting:
    """Gap-length checkpoint router (results/gap_length_sweep.json crossover)."""

    def test_routes_long_gaps_to_longgap_weights(self):
        from ml_audio_inpainting_tpu.runtime.inference import route_checkpoint

        assert route_checkpoint(0.5, "std.npz", "long.npz") == "long.npz"
        assert route_checkpoint(0.32, "std.npz", "long.npz") == "long.npz"

    def test_short_gaps_keep_standard(self):
        from ml_audio_inpainting_tpu.runtime.inference import route_checkpoint

        assert route_checkpoint(0.08, "std.npz", "long.npz") == "std.npz"
        assert route_checkpoint(0.16, "std.npz", "long.npz") == "std.npz"

    def test_no_longgap_checkpoint_is_passthrough(self):
        from ml_audio_inpainting_tpu.runtime.inference import route_checkpoint

        assert route_checkpoint(0.5, "std.npz", None) == "std.npz"
        assert route_checkpoint(0.5, None, None) is None

    def test_custom_threshold(self):
        from ml_audio_inpainting_tpu.runtime.inference import route_checkpoint

        assert route_checkpoint(0.2, "s", "l", threshold_s=0.1) == "l"
        assert route_checkpoint(0.2, "s", "l", threshold_s=0.3) == "s"
