"""Learned-basis SPAIN tests: basis optimization reduces L1, thresholding
semantics, inpainting quality, and phase-mode CNNBLSTM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.classical.basisopt import (
    aspain_learned,
    hard_threshold_columns,
    optimize_basis,
)
from ml_audio_inpainting_tpu.models.cnn_blstm import StackedBLSTMCNN
from ml_audio_inpainting_tpu.train.features import cnn_phase_features
from ml_audio_inpainting_tpu.train.losses import cnn_phase_l1_loss
from ml_audio_inpainting_tpu.train.metrics import gap_sdr
from ml_audio_inpainting_tpu.utils.config import SpectrogramConfig


class TestBasisOpt:
    def test_reduces_l1_on_mixed_signals(self, rng):
        """Training vectors dense in the identity but sparse after a known
        unitary rotation: the optimizer should find a basis that lowers L1."""
        N, M = 16, 64
        # sparse codes rotated by a random unitary
        theta = 0.4
        G = np.eye(N)
        G[0, 0] = G[1, 1] = np.cos(theta)
        G[0, 1], G[1, 0] = -np.sin(theta), np.sin(theta)
        codes = rng.standard_normal((N, M)) * (rng.random((N, M)) < 0.2)
        X = jnp.asarray(G @ codes, jnp.complex64)
        B, s0, s1 = optimize_basis(X, level_init=0.05, inner_steps=100, max_outer=6)
        assert s1 < s0, (s0, s1)
        # unitarity preserved
        err = np.abs(np.asarray(B @ B.conj().T) - np.eye(N)).max()
        assert err < 1e-4

    def test_threshold_columns(self):
        C = jnp.asarray(
            np.array([[3.0, 0.1], [1.0, 5.0], [0.5, 2.0], [0.2, 0.3]]), jnp.complex64
        )
        out = np.asarray(hard_threshold_columns(C, jnp.asarray(1)))
        # per column exactly one survivor (largest after DC/last down-weight)
        assert (np.abs(out) > 0).sum(axis=0).tolist() == [1, 1]
        assert out[0, 0] != 0 and out[1, 1] != 0


class TestAspainLearned:
    def test_identity_basis_inpaints_tone(self):
        sr = 16000
        t = np.arange(8192) / sr
        sig = np.sin(2 * np.pi * 800 * t).astype(np.float32)
        start, length = 4000, 320
        mask = np.ones_like(sig)
        mask[start : start + length] = 0
        B = jnp.eye(257, dtype=jnp.complex64)
        out = aspain_learned(
            jnp.asarray(sig * mask), jnp.asarray(mask), B, maxit=60,
            n_fft=512, hop_length=128, win_length=512,
        )
        sdr = float(gap_sdr(jnp.asarray(sig), out, jnp.asarray(1.0 - mask)))
        assert sdr > 5.0, sdr
        # reliable samples preserved through the consistency projection
        r = np.asarray(out)
        np.testing.assert_allclose(r[:start], sig[:start], atol=1e-5)


class TestPhaseMode:
    def test_phase_features_and_loss(self, speech_like):
        spec = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)
        audio = jnp.asarray(speech_like[:16000])[None, :]
        b = cnn_phase_features(
            audio, jax.random.PRNGKey(0), spec,
            gap_len_s=0.1, sample_rate=16000, n_samples=16000, gaps_per_audio=2,
        )
        F, N = 257, 1 + 16000 // 192
        assert b["spec_gap"].shape == (2, F, N, 2)
        assert jnp.iscomplexobj(b["target"])
        loss = cnn_phase_l1_loss(b["spec_gap"], b["target"], b["gap_mask"])
        assert np.isfinite(float(loss))

    def test_phase_model_reconstruct_complex(self):
        model = StackedBLSTMCNN(
            in_channels=2, freq_bins=33, lstm_hidden_dim=16, num_lstm_layers=1,
            enc_filters=(4, 8), dec_filters=(4, 8),
        )
        x = jnp.ones((1, 33, 21, 2)) * 0.5
        v = model.init(jax.random.PRNGKey(0), x)
        gm = jnp.zeros((1, 33, 21)).at[:, :, 5:9].set(1.0)
        out = model.reconstruct_spectrogram(v, x, gm)
        assert jnp.iscomplexobj(out)
        o = np.asarray(out)
        # outside the gap: input recombined to complex 0.5 + 0.5j
        np.testing.assert_allclose(o[:, :, 0], 0.5 + 0.5j, atol=1e-6)


class TestSspainLearned:
    def test_inpaints_tone_and_preserves_reliable(self):
        import numpy as np

        from ml_audio_inpainting_tpu.classical.basisopt import sspain_learned

        sr = 16000
        t = np.arange(8192) / sr
        sig = np.sin(2 * np.pi * 600 * t).astype(np.float32)
        start, length = 4000, 240
        mask = np.ones_like(sig)
        mask[start : start + length] = 0
        B = jnp.eye(257, dtype=jnp.complex64)
        out = sspain_learned(
            jnp.asarray(sig * mask), jnp.asarray(mask), B, maxit=50,
            n_fft=512, hop_length=128, win_length=512,
        )
        r = np.asarray(out)
        np.testing.assert_allclose(r[:start], sig[:start], atol=1e-5)
        seg = r[start : start + length]
        assert np.max(np.abs(seg)) > 0.1  # gap filled with signal
        assert np.all(np.isfinite(r))
