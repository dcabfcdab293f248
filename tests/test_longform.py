"""Long-form inference tests: chunking, OLA identity, gap routed to the
right window."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.runtime.longform import (
    chunk_signal,
    longform_inpaint,
    overlap_add,
)


class TestChunking:
    def test_chunk_shapes(self):
        x = jnp.arange(100.0)
        w, padded = chunk_signal(x, 40, 20)
        assert w.shape[1] == 40
        assert padded >= 100

    def test_ola_identity(self, speech_like):
        """chunk -> OLA with no processing must reproduce the signal."""
        x = jnp.asarray(speech_like[:50000])
        windows, _ = chunk_signal(x, 16000, 8000)
        rec = overlap_add(windows, 8000, 50000)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


class TestLongformInpaint:
    def test_identity_model_long_signal(self, speech_like):
        """With an identity 'model', long-form inpainting is lossless and
        only the gap windows are touched."""
        calls = []

        def fake_fn(variables, audio, gs, gl):
            calls.append(audio.shape[0])
            return audio, None

        x = jnp.asarray(np.tile(speech_like, 3))  # 15 s signal
        out = longform_inpaint(
            fake_fn, None, x, gap_start=120000, gap_len=1280,
            window=80000, hop=40000,
        )
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
        # only the windows overlapping sample 120000..121280 were processed
        assert sum(calls) <= 3
