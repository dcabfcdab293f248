"""Tests for the Pallas LSTM kernel (interpret mode on CPU), legacy BLSTM
variants, multi-gap corruption, and bootstrap statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.data.multigap import (
    apply_gaps_with_fades,
    cos2_fade,
    eval_gap_table,
    multi_gap_mask,
)
from ml_audio_inpainting_tpu.models.legacy_blstm import (
    StackedBLSTM,
    StackedBLSTMGapOnly,
    StackedNormBLSTM,
)
from ml_audio_inpainting_tpu.ops.pallas.lstm_cell import (
    _scan_reference,
    lstm_recurrence_pallas,
)
from ml_audio_inpainting_tpu.utils.stats import bootstrap_ci


class TestPallasLSTM:
    def test_matches_scan_both_directions(self):
        rng = np.random.default_rng(0)
        B, T, H = 3, 29, 16
        xw = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
        whh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, jnp.float32)
        for rev in (False, True):
            a = lstm_recurrence_pallas(xw, whh, rev)
            b = _scan_reference(xw, whh, rev)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_gradients_match_scan(self):
        rng = np.random.default_rng(1)
        B, T, H = 2, 11, 8
        xw = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
        whh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, jnp.float32)
        g1 = jax.grad(lambda x, w: jnp.sum(lstm_recurrence_pallas(x, w, False) ** 2))(xw, whh)
        g2 = jax.grad(lambda x, w: jnp.sum(_scan_reference(x, w, False) ** 2))(xw, whh)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    def test_fused_bidirectional_scan_matches_per_direction(self):
        """bilstm_fused_scan (one scan, direction-stacked carries) must be
        numerically identical to two lstm_scan calls -- values AND grads
        (it is the default non-Pallas BiLSTM path; checkpoint outputs and
        torch-port parity depend on exactness)."""
        from ml_audio_inpainting_tpu.ops.lstm import bilstm_fused_scan, lstm_scan

        rng = np.random.default_rng(2)
        B, T, H = 3, 23, 16
        xw_f = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
        xw_b = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
        w_f = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, jnp.float32)
        w_b = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, jnp.float32)
        z = jnp.zeros((B, H), jnp.float32)
        hs_f, hs_b = bilstm_fused_scan(xw_f, xw_b, w_f, w_b)
        ref_f = lstm_scan(xw_f, w_f, z, z, reverse=False)
        ref_b = lstm_scan(xw_b, w_b, z, z, reverse=True)
        np.testing.assert_allclose(np.asarray(hs_f), np.asarray(ref_f), atol=1e-6)
        np.testing.assert_allclose(np.asarray(hs_b), np.asarray(ref_b), atol=1e-6)

        def loss_fused(args):
            f, b = bilstm_fused_scan(xw_f, xw_b, args[0], args[1])
            return jnp.sum(f ** 2) + jnp.sum(b ** 3)

        def loss_ref(args):
            f = lstm_scan(xw_f, args[0], z, z, reverse=False)
            b = lstm_scan(xw_b, args[1], z, z, reverse=True)
            return jnp.sum(f ** 2) + jnp.sum(b ** 3)

        g1 = jax.grad(loss_fused)((w_f, w_b))
        g2 = jax.grad(loss_ref)((w_f, w_b))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestLegacyModels:
    def test_stacked_blstm_shapes(self):
        m = StackedBLSTM(audio_feat_dim=33, hidden_dim=16, num_layers=2)
        x = jnp.zeros((2, 21, 33))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (2, 21, 33)

    def test_gap_only_head(self):
        m = StackedBLSTMGapOnly(audio_feat_dim=100, gap_fraction=0.04, hidden_dim=16, num_layers=1)
        assert m.gap_feat_dim == 4
        x = jnp.zeros((1, 10, 100))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (1, 10, 4)

    def test_norm_blstm(self):
        m = StackedNormBLSTM(audio_feat_dim=20, hidden_dim=8, num_layers=2)
        x = jnp.ones((1, 7, 20))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 7, 20)
        assert "norm0" in v["params"] and "norm1" in v["params"]

    def test_legacy_compositing(self):
        m = StackedBLSTM(audio_feat_dim=8, hidden_dim=4, num_layers=1)
        x = jnp.full((1, 5, 8), 0.3)
        v = m.init(jax.random.PRNGKey(0), x)
        gm = jnp.zeros((1, 5, 8)).at[:, 2].set(1.0)
        out = np.asarray(m.reconstruct_spectrogram(v, x, gm))
        np.testing.assert_array_equal(out[:, [0, 1, 3, 4]], np.float32(0.3))


class TestMultiGap:
    def test_constraints(self):
        mask, starts, lengths = multi_gap_mask(
            jax.random.PRNGKey(0), 80000, n_gaps=10,
            min_gap_ms=10, max_gap_ms=80, min_dist_samples=2048,
        )
        s = np.asarray(starts)
        l = np.asarray(lengths)
        m = np.asarray(mask)
        assert np.all(l >= 16)
        # ordered, spaced, in bounds
        ends = s + l
        assert np.all(s[1:] - ends[:-1] >= 2048)
        assert s[0] >= 2048 and ends[-1] <= 80000 - 2048
        # mask zeros exactly at the gaps
        assert m.sum() == 80000 - l.sum()

    def test_different_keys_differ(self):
        m1, _, _ = multi_gap_mask(jax.random.PRNGKey(1), 80000, 5)
        m2, _, _ = multi_gap_mask(jax.random.PRNGKey(2), 80000, 5)
        assert not np.array_equal(np.asarray(m1), np.asarray(m2))

    def test_fades(self):
        audio = jnp.ones((16000,))
        starts = jnp.asarray([8000])
        lengths = jnp.asarray([800])
        out = np.asarray(apply_gaps_with_fades(audio, starts, lengths, fade_len=32))
        assert np.all(out[8000:8800] == 0)
        fade = out[8000 - 32 : 8000]
        assert np.all(np.diff(fade) <= 1e-6)  # monotone fade-out
        assert out[7950] == 1.0

    def test_fade_window(self):
        f = np.asarray(cos2_fade(16))
        assert f[0] == 1.0 and f[-1] < 1e-6

    def test_eval_table(self):
        masks, starts, lengths = eval_gap_table(9)
        assert masks.shape == (9, 80000)
        assert np.all(masks[:, 32000:33280] == 0)
        assert np.all(masks[:, :32000] == 1)


class TestBootstrap:
    def test_ci_covers_mean(self, rng):
        data = rng.normal(5.0, 1.0, size=(200, 3))
        mean, lo, hi = bootstrap_ci(data, n_boot=500)
        assert np.all(lo < mean) and np.all(mean < hi)
        assert np.all(np.abs(mean - 5.0) < 0.5)
        assert np.all(hi - lo < 1.0)

    def test_degenerate_single_sample(self):
        mean, lo, hi = bootstrap_ci(np.asarray([[1.0, 2.0]]))
        np.testing.assert_array_equal(mean, [1.0, 2.0])
        np.testing.assert_array_equal(lo, mean)
