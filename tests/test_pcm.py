"""ops/pcm.py: on-device PCM16 quantization for the serving transport."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.ops import from_pcm16, to_pcm16


class TestPcm16:
    def test_round_trip_half_lsb(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1.0, 1.0, size=(4, 1000)).astype(np.float32)
        y = np.asarray(from_pcm16(to_pcm16(jnp.asarray(x))))
        assert np.max(np.abs(y - x)) <= 0.5 / 32767.0 + 1e-9

    def test_representable_levels_exact(self):
        levels = jnp.asarray([-32768, -32767, -1, 0, 1, 12345, 32767], jnp.int16)
        assert np.array_equal(np.asarray(to_pcm16(from_pcm16(levels))), np.asarray(levels))

    def test_saturates_out_of_range(self):
        x = jnp.asarray([-2.0, -1.0001, 1.0001, 2.0, np.float32(1e6)])
        q = np.asarray(to_pcm16(x))
        assert q[0] == -32768 and q[1] == -32768
        assert q[2] == 32767 and q[3] == 32767 and q[4] == 32767

    def test_dtype_and_jit(self):
        x = jnp.zeros((2, 16))
        q = jax.jit(to_pcm16)(x)
        assert q.dtype == jnp.int16
        assert from_pcm16(q).dtype == jnp.float32

    def test_round_trip_snr_exceeds_delivered_precision(self):
        # Quantization noise must stay at/below the 16-bit PCM floor
        # (~96 dB SNR for a full-scale sine) -- i.e. the fetch loses
        # nothing relative to writing PCM on the host.
        t = np.arange(16000, dtype=np.float32) / 16000.0
        x = (0.9 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        y = np.asarray(from_pcm16(to_pcm16(jnp.asarray(x))))
        snr = 10 * np.log10(np.sum(x**2) / np.sum((y - x) ** 2))
        assert snr > 90.0
