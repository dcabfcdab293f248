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

    def test_multi_gap_matches_sequential_single_gap(self, speech_like):
        """Multiple gaps in one call == inpainting them one at a time (with
        a deterministic fake model), and each gap region is actually
        modified."""

        def fake_fn(variables, audio, gs, gl):
            # A deterministic "model" that writes a recognizable value into
            # the gap region only (mirrors the composite contract).
            idx = jnp.arange(audio.shape[-1])[None, :]
            in_gap = (idx >= gs[:, None]) & (idx < (gs + gl)[:, None])
            return jnp.where(in_gap, 0.25 + 0.5 * audio, audio), None

        x = jnp.asarray(np.tile(speech_like, 3))  # 15 s signal
        starts, lens = [60000, 120000, 200000], [1280, 2000, 640]
        multi = longform_inpaint(
            fake_fn, None, x, starts, lens, window=80000, hop=40000
        )
        seq = x
        for s, l in zip(starts, lens):
            seq = longform_inpaint(
                fake_fn, None, seq, s, l, window=80000, hop=40000
            )
        np.testing.assert_allclose(np.asarray(multi), np.asarray(seq), atol=1e-4)
        for s, l in zip(starts, lens):
            assert not np.allclose(
                np.asarray(multi[s:s + l]), np.asarray(x[s:s + l])
            )
        # Outside the gaps the signal is untouched.
        np.testing.assert_allclose(
            np.asarray(multi[:40000]), np.asarray(x[:40000]), atol=1e-5
        )

    def test_pad_batches_fixed_shape_and_equivalence(self, speech_like):
        """pad_batches=True: every model call has exactly (batch_size,
        window) shape (compile-free serving against one compiled program)
        and the result matches the unpadded path."""
        shapes = []

        def fake_fn(variables, audio, gs, gl):
            shapes.append(audio.shape)
            idx = jnp.arange(audio.shape[-1])[None, :]
            in_gap = (idx >= gs[:, None]) & (idx < (gs + gl)[:, None])
            return jnp.where(in_gap, 0.25 + 0.5 * audio, audio), None

        x = jnp.asarray(np.tile(speech_like, 3))
        starts, lens = [60000, 200000], [1280, 1280]
        padded = longform_inpaint(
            fake_fn, None, x, starts, lens,
            window=80000, hop=40000, batch_size=8, pad_batches=True,
        )
        assert all(s == (8, 80000) for s in shapes), shapes
        plain = longform_inpaint(
            fake_fn, None, x, starts, lens, window=80000, hop=40000
        )
        np.testing.assert_allclose(np.asarray(padded), np.asarray(plain), atol=1e-5)
