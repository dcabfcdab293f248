"""Reconstruction convenience API, visualization, TB analysis tests
(reference: ``tests/utils_test.py:551-620`` visualization style)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_audio_inpainting_tpu.ops import spectrogram_to_audio, stft
from ml_audio_inpainting_tpu.utils.tb_analysis import smooth
from ml_audio_inpainting_tpu.utils.visualize import visualize_spectrogram

GAN = dict(n_fft=512, hop_length=128, win_length=512)


class TestSpectrogramToAudio:
    def test_with_phase_reconstructs(self, speech_like):
        y = jnp.asarray(speech_like[:16000])
        spec = stft(y, **GAN)
        rec = spectrogram_to_audio(
            jnp.abs(spec), phase=jnp.angle(spec), length=16000, **GAN
        )
        np.testing.assert_allclose(np.asarray(rec), np.asarray(y), atol=1e-4)

    def test_phase_info_direct_istft(self, speech_like):
        y = jnp.asarray(speech_like[:16000])
        spec = stft(y, **GAN)
        rec = spectrogram_to_audio(spec, phase_info=True, length=16000, **GAN)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(y), atol=1e-4)

    def test_griffinlim_fallback(self, test_signals):
        y = test_signals["sine"]
        mag = jnp.abs(stft(jnp.asarray(y), **GAN))
        rec = spectrogram_to_audio(mag, n_iter=16, length=len(y), key=jax.random.PRNGKey(0), **GAN)
        assert rec.shape == (len(y),)
        assert np.all(np.isfinite(np.asarray(rec)))

    def test_db_heuristic(self, speech_like):
        """All-negative input is treated as dB and converted back
        (utils.py:313-314)."""
        y = jnp.asarray(speech_like[:16000])
        spec = stft(y, **GAN)
        mag = jnp.abs(spec)
        mag = mag / (jnp.max(mag) * 2.0)  # peak 0.5 -> dB strictly negative
        db = 20.0 * jnp.log10(mag + 1e-10)
        rec_db = spectrogram_to_audio(db, phase=jnp.angle(spec), length=16000, **GAN)
        rec = spectrogram_to_audio(mag, phase=jnp.angle(spec), length=16000, **GAN)
        c = np.corrcoef(np.asarray(rec_db), np.asarray(rec))[0, 1]
        assert c > 0.9


class TestVisualization:
    def test_returns_figure(self, speech_like):
        mag = np.abs(np.asarray(stft(jnp.asarray(speech_like[:16000]), **GAN)))
        fig = visualize_spectrogram(mag, power=1, hop_length=128, gap_int=(0.3, 0.5))
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_saves_file(self, tmp_path, speech_like):
        mag = np.abs(np.asarray(stft(jnp.asarray(speech_like[:16000]), **GAN)))
        out = tmp_path / "sub" / "spec.png"  # exercises auto-mkdir
        ret = visualize_spectrogram(mag, save_path=out)
        assert ret is None and out.exists() and out.stat().st_size > 1000

    def test_invalid_power_raises(self):
        with pytest.raises(ValueError):
            visualize_spectrogram(np.ones((4, 4)), power=3)


class TestTBAnalysis:
    def test_smooth_ema(self):
        x = np.asarray([0.0, 1.0, 1.0, 1.0])
        s = smooth(x, weight=0.5)
        assert s[0] == 0.0
        assert 0 < s[1] < 1 and s[3] > s[1]

    def test_smooth_constant(self):
        x = np.full(10, 3.0)
        np.testing.assert_allclose(smooth(x, 0.9), x)
