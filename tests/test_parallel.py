"""Mesh/sharding tests on the virtual 8-device CPU platform (SURVEY.md §4:
multi-device tests without TPUs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from ml_audio_inpainting_tpu.parallel.sharding import (
    make_sharded_step,
    place_state,
    state_shardings,
)
from ml_audio_inpainting_tpu.train.cnn_trainer import create_cnn_state, make_cnn_train_step
from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def small_cfg():
    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)
    cfg.data.max_len_s = 1.0
    cfg.data.gap_len_s = 0.1
    cfg.data.gaps_per_audio = 1
    cfg.model.cnn_blstm.lstm_hidden_dim = 32
    cfg.model.cnn_blstm.num_lstm_layers = 1
    cfg.model.cnn_blstm.enc_filters = [4, 8]
    cfg.model.cnn_blstm.dec_filters = [4, 8]
    return cfg


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh()
        assert m.shape["data"] == 8 and m.shape["model"] == 1
        m2 = make_mesh(model_parallel=2)
        assert m2.shape["data"] == 4 and m2.shape["model"] == 2

    def test_invalid_mesh(self):
        with pytest.raises(ValueError):
            make_mesh(data_parallel=3, model_parallel=2)

    def test_shard_batch_places_data(self):
        m = make_mesh()
        x = np.zeros((16, 100), np.float32)
        sx = shard_batch(x, m)
        assert sx.sharding.is_equivalent_to(batch_sharding(m), 2)


class TestShardedTraining:
    @pytest.mark.parametrize("dtype_tag", ["f32", "bf16"])
    def test_dp_step_matches_single_device(self, speech_like, dtype_tag):
        """The data-parallel step must be numerically equivalent to the
        single-device step (same batch, same key).  bf16 pins the
        production mixed-precision recipe (--train-dtype bf16) under DP."""
        cfg = small_cfg()
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        compute_dtype = jnp.bfloat16 if dtype_tag == "bf16" else None
        step = make_cnn_train_step(cfg, compute_dtype=compute_dtype)
        audio = jnp.tile(jnp.asarray(speech_like[:16000])[None, :], (8, 1))
        key = jax.random.PRNGKey(7)

        ref_state, ref_metrics = step(state, audio, key)

        mesh = make_mesh()
        sharded_step = make_sharded_step(step, state, mesh)
        p_state = place_state(state, mesh)
        p_audio = shard_batch(np.asarray(audio), mesh)
        out_state, out_metrics = sharded_step(p_state, p_audio, key)

        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]),
            rtol=1e-5 if dtype_tag == "f32" else 5e-3,
        )
        # Adam maps near-zero grads to +-lr steps, so float reduction-order
        # noise across the mesh can flip a dead param's step sign; bound the
        # divergence by one step size (lr=1e-4 -> 2e-4 worst case).
        ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
        out_leaves = jax.tree_util.tree_leaves(out_state.params)
        for a, b in zip(ref_leaves, out_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)

    def test_dp_plus_tp_compiles_and_runs(self, speech_like):
        """2-way model parallel x 4-way data parallel end to end."""
        cfg = small_cfg()
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(model_parallel=2)
        step = make_cnn_train_step(cfg)
        sharded_step = make_sharded_step(step, state, mesh)
        p_state = place_state(state, mesh)
        audio = shard_batch(
            np.tile(np.asarray(speech_like[:16000])[None, :], (4, 1)), mesh
        )
        out_state, metrics = sharded_step(p_state, audio, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    def test_dp_plus_tp_matches_single_device(self, speech_like):
        """The DP x TP step must be numerically equivalent to the
        single-device step, not merely finite (VERDICT r3 #3): a wrong
        `model`-axis sharding of the BiLSTM projections would change the
        loss/updates, which this pins to the same tolerances as the DP test.

        Uses a hidden dim large enough (512 -> w_ih rows 2*512+freq-bins >=
        _TP_MIN_DIM) that the TP rule actually shards the projections --
        with the default test dims every param is replicated and this test
        would degenerate to the DP test.
        """
        from ml_audio_inpainting_tpu.parallel.sharding import param_sharding_rules

        cfg = small_cfg()
        cfg.model.cnn_blstm.lstm_hidden_dim = 512
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        step = make_cnn_train_step(cfg)
        audio = jnp.tile(jnp.asarray(speech_like[:16000])[None, :], (4, 1))
        key = jax.random.PRNGKey(7)

        ref_state, ref_metrics = step(state, audio, key)

        mesh = make_mesh(model_parallel=2)
        # Guard: at least one param must actually be model-sharded.
        rule = param_sharding_rules(mesh)
        specs = jax.tree_util.tree_map_with_path(
            lambda p, l: rule(p, l).spec, state.params
        )
        assert any(
            "model" in str(s) for s in jax.tree_util.tree_leaves(specs)
        ), "TP rule sharded nothing; test dims too small"

        sharded_step = make_sharded_step(step, state, mesh)
        p_state = place_state(state, mesh)
        p_audio = shard_batch(np.asarray(audio), mesh)
        out_state, out_metrics = sharded_step(p_state, p_audio, key)

        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )
        # Same Adam sign-flip bound as the DP test (lr 1e-4 -> 2e-4).
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.params),
            jax.tree_util.tree_leaves(out_state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)

    @pytest.mark.parametrize("dtype_tag", ["f32", "bf16"])
    def test_gan_dp_step_matches_single_device(self, speech_like, dtype_tag):
        """The GAN two-optimizer DP step must be numerically equivalent to
        the single-device step (VERDICT r3 #2) -- the exact analogue of
        test_dp_step_matches_single_device for the flagship family, built
        with the same pjit shardings as cli/train.py's GAN branch.  Pins
        the global-batch BatchNorm reduction, the spectral-norm power
        iteration and the PRNG folding under sharding.

        The bf16 case pins the PRODUCTION recipe (--train-dtype bf16):
        mixed-precision compute must not change the DP==single-device
        contract (f32 master weights; the bf16 forward is bitwise-
        reproducible per device, so the only cross-device freedom is the
        f32 gradient/BatchNorm reduction order, same as the f32 case)."""
        import sys

        sys.path.insert(0, "tests")
        from test_gan import tiny_gan_config

        from ml_audio_inpainting_tpu.train.gan_trainer import (
            create_gan_states,
            make_gan_train_step,
        )

        cfg = tiny_gan_config()
        g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0))
        compute_dtype = jnp.bfloat16 if dtype_tag == "bf16" else None
        step = make_gan_train_step(cfg, compute_dtype=compute_dtype)
        audio = jnp.tile(jnp.asarray(speech_like[:16000])[None, :], (8, 1))
        key = jax.random.PRNGKey(7)

        g_ref, d_ref, m_ref = step(g_state, d_state, audio, key)

        mesh = make_mesh()
        g_sh = state_shardings(g_state, mesh)
        d_sh = state_shardings(d_state, mesh)
        sharded_step = jax.jit(
            step,
            in_shardings=(g_sh, d_sh, batch_sharding(mesh), replicated(mesh)),
            out_shardings=(g_sh, d_sh, replicated(mesh)),
        )
        p_g = jax.device_put(g_state, g_sh)
        p_d = jax.device_put(d_state, d_sh)
        p_audio = shard_batch(np.asarray(audio), mesh)
        g_out, d_out, m_out = sharded_step(p_g, p_d, p_audio, key)

        # bf16: the per-device forward is bitwise-reproducible, but batch
        # reductions that mix bf16 activations (BatchNorm moments, loss
        # means) see a different association order under DP -- one bf16
        # rounding step of slack (~2^-8 relative) is the expected scale.
        m_rtol, bn_rtol, bn_atol = (
            (2e-5, 1e-4, 1e-5) if dtype_tag == "f32" else (5e-3, 2e-2, 1e-3)
        )
        for k in ("g_total", "d_total"):
            np.testing.assert_allclose(
                float(m_out[k]), float(m_ref[k]), rtol=m_rtol, err_msg=k
            )
        # Adam sign-flip bound: G/D lr 2e-4 -> 4e-4 worst case per step.
        for name, ref, out in (
            ("g_params", g_ref.params, g_out.params),
            ("d_params", d_ref.params, d_out.params),
        ):
            for a, b in zip(
                jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=4.1e-4, err_msg=name
                )
        # BatchNorm running stats must reflect the GLOBAL batch moments
        # (pjit computes the full-batch mean via collectives), and the
        # spectral-norm power-iteration vectors are deterministic state.
        for name, ref, out in (
            ("g_batch_stats", g_ref.batch_stats, g_out.batch_stats),
            ("d_batch_stats", d_ref.batch_stats, d_out.batch_stats),
        ):
            for a, b in zip(
                jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=bn_rtol, atol=bn_atol,
                    err_msg=name,
                )

    def test_multi_step_training_progresses(self, speech_like):
        cfg = small_cfg()
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh()
        step = make_sharded_step(make_cnn_train_step(cfg), state, mesh)
        state = place_state(state, mesh)
        audio = shard_batch(
            np.tile(np.asarray(speech_like[:16000])[None, :], (8, 1)), mesh
        )
        losses = []
        for i in range(8):
            state, m = step(state, audio, jax.random.PRNGKey(i % 2))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]


class TestShardedServing:
    def test_sharded_serving_matches_single_device(self, speech_like):
        """DP-sharded serving must return exactly what the single-device
        program returns (no cross-example coupling on the forward path)."""
        from ml_audio_inpainting_tpu.runtime.inference import (
            make_gan_inpaint_fn,
            make_sharded_serving_fn,
        )
        from ml_audio_inpainting_tpu.train.gan_trainer import build_generator

        cfg = Config()
        cfg.data.spectrogram = SpectrogramConfig(
            n_fft=512, hop_length=128, win_length=512
        )
        cfg.data.max_len_s = 1.0
        gen = build_generator(cfg)
        B, S = 8, 16000
        audio = jnp.asarray(
            np.stack([speech_like[i * S:(i + 1) * S] for i in range(5)] +
                     [speech_like[:S]] * 3)
        )
        n_frames = S // 128 + 1
        variables = gen.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 257, n_frames)),
            jnp.ones((1, 257, n_frames)),
            train=False,
        )
        gs = jnp.asarray(np.linspace(2000, 10000, B).astype(np.int32))
        gl = jnp.full((B,), 1280, jnp.int32)

        fn = make_gan_inpaint_fn(cfg, gen)
        single, _ = fn(variables, audio, gs, gl)

        mesh = make_mesh()
        sharded_fn = make_sharded_serving_fn(fn, mesh)
        sharded, _ = sharded_fn(variables, audio, gs, gl)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), atol=2e-6
        )

    def test_sharded_serving_rejects_indivisible_batch(self, speech_like):
        from ml_audio_inpainting_tpu.runtime.inference import (
            make_gan_inpaint_fn,
            make_sharded_serving_fn,
        )
        from ml_audio_inpainting_tpu.train.gan_trainer import build_generator

        cfg = Config()
        cfg.data.spectrogram = SpectrogramConfig(
            n_fft=512, hop_length=128, win_length=512
        )
        cfg.data.max_len_s = 1.0
        gen = build_generator(cfg)
        fn = make_gan_inpaint_fn(cfg, gen)
        sharded_fn = make_sharded_serving_fn(fn, make_mesh())
        bad = jnp.zeros((3, 16000))
        with pytest.raises(ValueError, match="not divisible"):
            sharded_fn({}, bad, jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32))
