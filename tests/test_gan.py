"""GAN family tests: PConv renormalization semantics, U-Net shape/mask
plumbing, spectral-norm discriminator, VGG preprocessing, and a short
adversarial training run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.models.discriminator import Discriminator
from ml_audio_inpainting_tpu.models.pconv_unet import PartialConv, PConvUNet
from ml_audio_inpainting_tpu.models.vgg import (
    VGG19Features,
    preprocess_for_vgg,
    vgg19_params,
    vgg_perceptual_style_losses,
)
from ml_audio_inpainting_tpu.train.gan_trainer import (
    create_gan_states,
    make_gan_eval_step,
    make_gan_train_step,
)
from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig


def tiny_gan_config() -> Config:
    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    cfg.data.max_len_s = 1.0
    cfg.data.gap_len_s = 0.1
    cfg.model.generator.enc_layer_cfg = [(8, 7, 2), (16, 5, 2), (16, 3, 2)]
    cfg.model.generator.dec_layer_cfg = [(16, 3, 1), (8, 3, 1)]
    cfg.model.generator.final_interim_ch = 8
    cfg.model.discriminator.layer_cfg = [(8, 2), (16, 2)]
    cfg.training.lambda_vgg_perceptual = 0.0
    cfg.training.lambda_vgg_style = 0.0
    return cfg


class TestPartialConv:
    def test_full_mask_is_plain_conv(self):
        """With an all-ones mask the renormalization is the identity
        (window/window) and PConv == Conv (networks.py:87-92)."""
        pc = PartialConv(features=4, kernel=3, stride=1, use_bias=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
        mask = jnp.ones((1, 8, 8, 1))
        params = pc.init(jax.random.PRNGKey(1), x, mask, 2 * mask)
        out, new_mask = pc.apply(params, x, mask, 2 * mask)
        # interior pixels: mask conv is saturated -> ratio == 1 -> plain conv
        kernel = params["params"]["conv"]["kernel"]
        ref = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 1:-1, 1:-1]), np.asarray(ref[:, 1:-1, 1:-1]), rtol=2e-4, atol=1e-5
        )
        assert np.all(np.asarray(new_mask) == 1.0)

    def test_hole_renormalization(self):
        """Inside a hole larger than the kernel the output is bias-only and
        the updated mask stays 0; at the hole edge the mask becomes valid."""
        pc = PartialConv(features=1, kernel=3, stride=1, use_bias=True)
        x = jnp.ones((1, 12, 12, 1))
        mask = jnp.ones((1, 12, 12, 1)).at[:, 4:8, 4:8, :].set(0.0)
        params = pc.init(jax.random.PRNGKey(0), x, mask, mask)
        out, new_mask = pc.apply(params, x, mask, mask)
        nm = np.asarray(new_mask[0, :, :, 0])
        assert nm[5, 5] == 0.0 and nm[6, 6] == 0.0  # deep inside hole
        assert nm[4, 4] > 0.0  # receptive field touches valid pixels
        assert nm[0, 0] == 1.0

    def test_masked_equals_unmasked_on_valid_region(self):
        """Renormalized conv over a masked input equals the conv over the
        valid pixels only -- the defining PConv property."""
        pc = PartialConv(features=3, kernel=3, stride=1, use_bias=False)
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (1, 10, 10, 1))
        mask = jnp.ones((1, 10, 10, 1)).at[:, :, 5:, :].set(0.0)
        params = pc.init(jax.random.PRNGKey(3), x, mask, mask)
        out_masked, _ = pc.apply(params, x, mask, mask)
        out_full, _ = pc.apply(params, x, jnp.ones_like(mask), jnp.ones_like(mask))
        # Columns 0..2 have fully-valid receptive fields -> identical output.
        np.testing.assert_allclose(
            np.asarray(out_masked[:, 2:-2, :3]), np.asarray(out_full[:, 2:-2, :3]),
            rtol=2e-4, atol=1e-5,
        )


class TestPConvUNet:
    def test_full_profile_shape(self):
        """Production contract: (B, 257, 626) in/out, values in [-1, 1]."""
        net = PConvUNet()
        x = jnp.zeros((1, 257, 626))
        m = jnp.ones((1, 257, 626))
        variables = net.init(jax.random.PRNGKey(0), x, m, train=False)
        y = net.apply(variables, x, m, train=False)
        assert y.shape == (1, 257, 626)
        assert float(jnp.max(jnp.abs(y))) <= 1.0

    def test_small_net_mask_sensitivity(self):
        """Output inside the hole must depend on the mask."""
        net = PConvUNet(
            enc_layer_cfg=((8, 7, 2), (16, 5, 2)),
            dec_layer_cfg=((8, 3, 1),),
            final_interim_ch=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64))
        m_full = jnp.ones((1, 64, 64))
        m_hole = m_full.at[:, :, 20:30].set(0.0)
        variables = net.init(jax.random.PRNGKey(1), x, m_full, train=False)
        y_full = net.apply(variables, x, m_full, train=False)
        y_hole = net.apply(variables, x * m_hole, m_hole, train=False)
        assert not np.allclose(np.asarray(y_full), np.asarray(y_hole))


class TestDiscriminator:
    def test_patch_output_and_spectral_norm_state(self):
        d = Discriminator()
        x = jnp.zeros((2, 257, 626))
        variables = d.init(jax.random.PRNGKey(0), x, train=False)
        y = d.apply(variables, x, train=False)
        assert y.ndim == 4 and y.shape[0] == 2 and y.shape[-1] == 1
        assert "batch_stats" in variables  # power-iteration vectors

    def test_spectral_norm_bounds_lipschitz(self):
        """After normalization, scaling weights by 10x must NOT scale the
        output 10x (spectral norm divides it out)."""
        d = Discriminator(layer_cfg=((8, 2),), kernel_size=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32))
        variables = d.init(jax.random.PRNGKey(1), x, train=False)
        y1 = d.apply(variables, x, train=False)
        scaled = jax.tree_util.tree_map(lambda p: p * 10.0, variables["params"])
        y2 = d.apply({"params": scaled, "batch_stats": variables["batch_stats"]}, x, train=False)
        ratio = float(jnp.mean(jnp.abs(y2)) / (jnp.mean(jnp.abs(y1)) + 1e-8))
        assert ratio < 5.0  # far below the unnormalized 10x (or 100x for 2 layers)


class TestVGG:
    def test_feature_shapes(self):
        model, variables = vgg19_params(capture_layers=(0, 2, 5))
        x = jnp.zeros((1, 64, 64, 3))
        feats = model.apply(variables, x)
        assert feats[0].shape == (1, 64, 64, 64)
        assert feats[5].shape == (1, 32, 32, 128)

    def test_preprocess_resize_crop(self):
        x = jnp.zeros((2, 257, 626))
        out = preprocess_for_vgg(x, is_generated=True)
        assert out.shape == (2, 224, 224, 3)

    def test_losses_zero_for_identical(self):
        model, variables = vgg19_params(capture_layers=(0, 2))
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64)))
        p, s = vgg_perceptual_style_losses(
            model, variables, x, x, perceptual_layers=(2,), style_layers=(0,)
        )
        # generated path maps [-1,1]->[0,1]; target path max-normalizes --
        # identical inputs do NOT imply zero loss, but self-vs-self through
        # the same path must:
        from ml_audio_inpainting_tpu.models.vgg import preprocess_for_vgg as pp

        f1 = model.apply(variables, pp(x, True))
        f2 = model.apply(variables, pp(x, True))
        np.testing.assert_allclose(np.asarray(f1[2]), np.asarray(f2[2]), rtol=1e-6)
        assert np.isfinite(float(p)) and np.isfinite(float(s))


class TestGANTraining:
    def test_adversarial_step_runs_and_learns(self, speech_like):
        cfg = tiny_gan_config()
        g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0))
        step = make_gan_train_step(cfg)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        g_losses = []
        for i in range(12):
            g_state, d_state, metrics = step(g_state, d_state, audio, jax.random.PRNGKey(i))
            g_losses.append(float(metrics["g_total"]))
            assert np.isfinite(g_losses[-1])
            assert np.isfinite(float(metrics["d_total"]))
        assert g_losses[-1] < g_losses[0], g_losses

    def test_remat_step_matches_plain_step(self, speech_like):
        """remat=True must be numerically identical: jax.checkpoint changes
        WHEN activations are computed (backward recompute), never WHAT --
        params, opt state, and losses after a step agree to float tolerance."""
        cfg = tiny_gan_config()
        audio = jnp.asarray(speech_like[:16000])[None, :]
        key = jax.random.PRNGKey(3)

        ga, da = create_gan_states(cfg, jax.random.PRNGKey(0))
        gb, db = create_gan_states(cfg, jax.random.PRNGKey(0))
        step_plain = make_gan_train_step(cfg)
        step_remat = make_gan_train_step(cfg, remat=True)

        ga, da, ma = step_plain(ga, da, audio, key)
        gb, db, mb = step_remat(gb, db, audio, key)
        assert abs(float(ma["g_total"]) - float(mb["g_total"])) < 1e-5
        assert abs(float(ma["d_total"]) - float(mb["d_total"])) < 1e-5
        for a, b in zip(
            jax.tree_util.tree_leaves((ga.params, da.params, ga.batch_stats)),
            jax.tree_util.tree_leaves((gb.params, db.params, gb.batch_stats)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_reduced_precision_dtype_preserved(self):
        """preprocess_for_vgg must not promote a bf16 input back to f32 (the
        ImageNet mean/std constants follow the input dtype) — otherwise the
        whole VGG stack silently runs f32 under mixed precision."""
        x = jnp.ones((1, 64, 64), jnp.bfloat16)
        assert preprocess_for_vgg(x, is_generated=True).dtype == jnp.bfloat16
        x32 = jnp.ones((1, 64, 64), jnp.float32)
        assert preprocess_for_vgg(x32, is_generated=False).dtype == jnp.float32

    def test_fused_g_forward_matches_legacy(self, speech_like):
        """fused_g_forward (single G forward shared by both updates via
        jax.vjp) must match the legacy two-forward step: D quantities are
        the same computation (identical fake_detached), G quantities differ
        only by FP reassociation of the pullback.  Run a short trajectory
        in BOTH modes to catch compounding divergence."""
        cfg = tiny_gan_config()
        audio = jnp.asarray(speech_like[:16000])[None, :]

        gF, dF = create_gan_states(cfg, jax.random.PRNGKey(0))
        stepF = make_gan_train_step(cfg, fused_g_forward=True)
        gL, dL = create_gan_states(cfg, jax.random.PRNGKey(0))
        stepL = make_gan_train_step(cfg, fused_g_forward=False)

        for i in range(5):
            gF, dF, mF = stepF(gF, dF, audio, jax.random.PRNGKey(i))
            gL, dL, mL = stepL(gL, dL, audio, jax.random.PRNGKey(i))
            np.testing.assert_allclose(
                float(mF["d_total"]), float(mL["d_total"]), rtol=1e-5
            )
            np.testing.assert_allclose(
                float(mF["g_total"]), float(mL["g_total"]), rtol=1e-5
            )
        # Adam sign-flip bound (lr 2e-4) over 5 steps.
        for ref, out in ((gL.params, gF.params), (dL.params, dF.params)):
            for a, b in zip(
                jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=5 * 4.1e-4
                )
        # BatchNorm stats come from the same single forward -> tight.
        for a, b in zip(
            jax.tree_util.tree_leaves(gL.batch_stats),
            jax.tree_util.tree_leaves(gF.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_fused_g_forward_matches_legacy_remat(self, speech_like):
        """remat + fused: jax.checkpoint'd G forward under jax.vjp must
        still be numerically identical to the remat legacy step for one
        step (remat is exact by construction)."""
        cfg = tiny_gan_config()
        audio = jnp.asarray(speech_like[:16000])[None, :]
        g0, d0 = create_gan_states(cfg, jax.random.PRNGKey(0))
        outs = []
        for fused in (True, False):
            step = make_gan_train_step(cfg, remat=True, fused_g_forward=fused)
            g1, d1, m = step(g0, d0, audio, jax.random.PRNGKey(3))
            outs.append((g1, m))
        np.testing.assert_allclose(
            float(outs[0][1]["g_total"]), float(outs[1][1]["g_total"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(outs[0][0].params),
            jax.tree_util.tree_leaves(outs[1][0].params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-4)

    def test_bf16_mixed_precision_step(self, speech_like):
        """compute_dtype=bf16: master weights/opt state stay f32, losses are
        finite and track the f32 step at step 1, and repeated steps learn."""
        cfg = tiny_gan_config()
        audio = jnp.asarray(speech_like[:16000])[None, :]

        g32, d32 = create_gan_states(cfg, jax.random.PRNGKey(0))
        step32 = make_gan_train_step(cfg)
        g32_1, _, m32 = step32(g32, d32, audio, jax.random.PRNGKey(0))

        g16, d16 = create_gan_states(cfg, jax.random.PRNGKey(0))
        step16 = make_gan_train_step(cfg, compute_dtype=jnp.bfloat16)
        losses = []
        for i in range(12):
            g16, d16, m16 = step16(g16, d16, audio, jax.random.PRNGKey(i))
            losses.append(float(m16["g_total"]))
            assert np.isfinite(losses[-1]) and np.isfinite(float(m16["d_total"]))
            if i == 0:
                # Same PRNG stream -> same gaps; bf16 forward should land
                # within a few percent of the f32 losses on step 1.
                assert abs(losses[0] - float(m32["g_total"])) < 0.05 * abs(
                    float(m32["g_total"])
                ), (losses[0], float(m32["g_total"]))
                # The BatchNorm EMA accumulates in f32 (the G stats are
                # deliberately not cast): after one identical-stream step
                # the bf16 run's running stats match the f32 run's up to
                # bf16 forward noise. A bf16 EMA would diverge/freeze.
                for a, b in zip(
                    jax.tree_util.tree_leaves(g16.batch_stats),
                    jax.tree_util.tree_leaves(g32_1.batch_stats),
                ):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
                    )
        assert losses[-1] < losses[0], losses

        # Master state stays f32 end to end (params, opt state, batch stats).
        for leaf in jax.tree_util.tree_leaves(
            (g16.params, g16.opt_state, g16.batch_stats, d16.params, d16.batch_stats)
        ):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype

        # The BatchNorm EMA must accumulate at full precision (the G stats
        # are deliberately not cast): after 12 identical-stream steps the
        # bf16 run's running stats track the f32 run's closely. A bf16 EMA
        # would freeze (increment rounds to zero at momentum 0.99).
        g32_12, d32_12 = create_gan_states(cfg, jax.random.PRNGKey(0))
        for i in range(12):
            g32_12, d32_12, _ = step32(g32_12, d32_12, audio, jax.random.PRNGKey(i))
        for a, b in zip(
            jax.tree_util.tree_leaves(g16.batch_stats),
            jax.tree_util.tree_leaves(g32_12.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.05, atol=0.05
            )

    def test_eval_step(self, speech_like):
        cfg = tiny_gan_config()
        g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0))
        ev = make_gan_eval_step(cfg)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        out = ev(g_state, d_state, audio, jax.random.PRNGKey(0))
        assert np.isfinite(float(out["g_total"]))


class TestGeneratorEMA:
    """--g-ema: serving-side EMA of the generator params (no reference
    counterpart; the reference serves raw live weights, train.py:419-506)."""

    def test_ema_seeded_with_initial_params(self):
        cfg = tiny_gan_config()
        g_state, _ = create_gan_states(cfg, jax.random.PRNGKey(0), g_ema=0.9)
        assert g_state.ema_params is not None
        for e, p in zip(
            jax.tree_util.tree_leaves(g_state.ema_params),
            jax.tree_util.tree_leaves(g_state.params),
        ):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    def test_ema_disabled_by_default(self):
        cfg = tiny_gan_config()
        g_state, _ = create_gan_states(cfg, jax.random.PRNGKey(0))
        assert g_state.ema_params is None

    def test_ema_is_exact_blend_of_live_trajectory(self, speech_like):
        """After each step, ema must equal decay*ema_prev + (1-decay)*params;
        verified against a host-side replay of the live-param trajectory."""
        decay = 0.5
        cfg = tiny_gan_config()
        g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0), g_ema=decay)
        step = make_gan_train_step(cfg, g_ema=decay)
        audio = jnp.asarray(speech_like[:16000])[None, :]

        expect = jax.tree_util.tree_map(np.asarray, jax.device_get(g_state.params))
        for i in range(3):
            g_state, d_state, _ = step(g_state, d_state, audio, jax.random.PRNGKey(i))
            live = jax.device_get(g_state.params)
            expect = jax.tree_util.tree_map(
                lambda e, p: decay * e + (1 - decay) * np.asarray(p), expect, live
            )
        for e, g in zip(
            jax.tree_util.tree_leaves(expect),
            jax.tree_util.tree_leaves(jax.device_get(g_state.ema_params)),
        ):
            np.testing.assert_allclose(e, np.asarray(g), rtol=1e-5, atol=1e-6)
        # and the EMA genuinely lags the live params after updates
        diffs = [
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree_util.tree_leaves(jax.device_get(g_state.ema_params)),
                jax.tree_util.tree_leaves(jax.device_get(g_state.params)),
            )
        ]
        assert max(diffs) > 0

    def test_ema_params_serve_through_inference(self, speech_like):
        from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
        from ml_audio_inpainting_tpu.train.gan_trainer import build_generator

        cfg = tiny_gan_config()
        g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0), g_ema=0.9)
        step = make_gan_train_step(cfg, g_ema=0.9)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        g_state, d_state, _ = step(g_state, d_state, audio, jax.random.PRNGKey(0))
        fn = make_gan_inpaint_fn(cfg, build_generator(cfg), mode="enhanced")
        variables = {"params": g_state.ema_params}
        if g_state.batch_stats is not None:
            variables["batch_stats"] = g_state.batch_stats
        out, _ = fn(variables, audio, jnp.asarray([4000]), jnp.asarray([800]))
        assert np.isfinite(np.asarray(out)).all()
