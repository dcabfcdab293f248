"""DSP core tests: STFT/iSTFT round trips, profile shapes, Griffin-Lim quality.

Ports the property-test backbone of the reference suite
(``tests/utils_test.py``): exact reconstruction with phase, magnitude/phase
recombination identity, Griffin-Lim spectral-correlation floors per signal
class, and the two STFT profile shape contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.ops import (
    griffinlim,
    istft,
    magnitude,
    mel_filterbank,
    mel_spectrogram,
    num_frames,
    stft,
)

SR = 16000

# The two STFT profiles that must be reproduced exactly (SURVEY.md §2.7).
GAN_PROFILE = dict(n_fft=512, hop_length=128, win_length=512)
CNN_PROFILE = dict(n_fft=512, hop_length=192, win_length=384)


class TestShapes:
    def test_gan_profile_shape(self, speech_like):
        spec = stft(jnp.asarray(speech_like), **GAN_PROFILE)
        assert spec.shape == (257, 626)
        assert jnp.iscomplexobj(spec)

    def test_cnn_profile_shape(self, speech_like):
        spec = stft(jnp.asarray(speech_like), **CNN_PROFILE)
        assert spec.shape == (257, 417)

    def test_batched(self, speech_like):
        batch = jnp.stack([jnp.asarray(speech_like)] * 3)
        spec = stft(batch, **GAN_PROFILE)
        assert spec.shape == (3, 257, 626)
        single = stft(jnp.asarray(speech_like), **GAN_PROFILE)
        np.testing.assert_allclose(np.asarray(spec[0]), np.asarray(single), rtol=1e-6, atol=1e-6)

    def test_num_frames_helper(self):
        assert num_frames(80000, 128, 512) == 626
        assert num_frames(80000, 192, 512) == 417

    def test_power_identity(self, speech_like):
        """power=2 spectrogram equals the square of power=1 (utils_test.py:260-305)."""
        spec = stft(jnp.asarray(speech_like), **GAN_PROFILE)
        m1 = magnitude(spec, 1.0)
        m2 = magnitude(spec, 2.0)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1) ** 2, rtol=1e-5, atol=1e-8)


class TestRoundTrip:
    @pytest.mark.parametrize("profile", [GAN_PROFILE, CNN_PROFILE], ids=["gan", "cnn"])
    def test_perfect_reconstruction_with_phase(self, test_signals, profile):
        """STFT -> iSTFT with exact phase reconstructs the signal
        (reference gate: atol=1e-10 in float64, utils_test.py:780-809)."""
        with jax.enable_x64():
            for name, sig in test_signals.items():
                y = jnp.asarray(sig, jnp.float64)
                spec = stft(y, **profile)
                rec = istft(spec, **profile, length=y.shape[-1])
                np.testing.assert_allclose(
                    np.asarray(rec), np.asarray(y), atol=1e-10, err_msg=name
                )

    def test_magnitude_phase_recombination(self, speech_like):
        """|S| * exp(i*angle(S)) == S -> identical reconstruction
        (utils_test.py:811-849)."""
        y = jnp.asarray(speech_like)
        spec = stft(y, **GAN_PROFILE)
        recombined = jnp.abs(spec) * jnp.exp(1j * jnp.angle(spec))
        rec = istft(recombined, **GAN_PROFILE, length=y.shape[-1])
        np.testing.assert_allclose(np.asarray(rec), np.asarray(y), atol=1e-4)

    def test_float32_roundtrip_close(self, speech_like):
        y = jnp.asarray(speech_like)
        rec = istft(stft(y, **GAN_PROFILE), **GAN_PROFILE, length=y.shape[-1])
        assert float(jnp.max(jnp.abs(rec - y))) < 1e-4

    @pytest.mark.parametrize("hop", [64, 128, 256])
    def test_hop_sweep(self, speech_like, hop):
        """Window/hop sweeps with correlation floors (utils_test.py:1006-1110)."""
        y = jnp.asarray(speech_like)
        rec = istft(stft(y, n_fft=512, hop_length=hop), n_fft=512, hop_length=hop, length=y.shape[-1])
        c = np.corrcoef(np.asarray(rec), np.asarray(y))[0, 1]
        assert c > 0.999


def _spectral_correlation(a, b, profile):
    ma = np.asarray(jnp.abs(stft(jnp.asarray(a), **profile)))
    mb = np.asarray(jnp.abs(stft(jnp.asarray(b), **profile)))
    return np.corrcoef(ma.ravel(), mb.ravel())[0, 1]


class TestGriffinLim:
    def test_tonal_quality(self, test_signals):
        """Spectral correlation > 0.9 for tonal signals (utils_test.py:851-905)."""
        for name in ("sine", "sine_combo", "chirp"):
            y = test_signals[name]
            mag = jnp.abs(stft(jnp.asarray(y), **GAN_PROFILE))
            rec = griffinlim(mag, n_iter=32, **GAN_PROFILE, length=len(y), key=jax.random.PRNGKey(7))
            assert _spectral_correlation(np.asarray(rec), y, GAN_PROFILE) > 0.9, name

    def test_all_signals_floor(self, test_signals):
        """Spectral correlation > 0.7 for every signal class."""
        for name, y in test_signals.items():
            mag = jnp.abs(stft(jnp.asarray(y), **GAN_PROFILE))
            rec = griffinlim(mag, n_iter=32, **GAN_PROFILE, length=len(y), key=jax.random.PRNGKey(7))
            assert _spectral_correlation(np.asarray(rec), y, GAN_PROFILE) > 0.7, name

    def test_convergence_in_iterations(self, test_signals):
        """More iterations do not hurt quality (utils_test.py:907-956)."""
        y = test_signals["sine_combo"]
        mag = jnp.abs(stft(jnp.asarray(y), **GAN_PROFILE))
        corrs = []
        for it in (2, 8, 32):
            rec = griffinlim(mag, n_iter=it, **GAN_PROFILE, length=len(y), key=jax.random.PRNGKey(3))
            corrs.append(_spectral_correlation(np.asarray(rec), y, GAN_PROFILE))
        assert corrs[-1] >= corrs[0] - 0.02


class TestMel:
    def test_filterbank_shape_and_coverage(self):
        fb = mel_filterbank(SR, 512, n_mels=64)
        assert fb.shape == (64, 257)
        # Every filter has nonzero support; interior bins are covered.
        assert (fb.sum(axis=1) > 0).all()

    def test_mel_spectrogram_shape(self, speech_like):
        m = mel_spectrogram(jnp.asarray(speech_like), sample_rate=SR, n_fft=512, hop_length=192, n_mels=64)
        assert m.shape == (64, 417)
        assert bool(jnp.all(m >= 0))
