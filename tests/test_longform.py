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

    def test_gap_fetch_patches(self, speech_like):
        """gap_fetch: the PCM16 patches + client composite reproduce the
        composited full waveform (exact outside gaps by construction,
        within one LSB of the recomputed reference inside)."""
        from ml_audio_inpainting_tpu.ops.gaps import gap_mask
        from ml_audio_inpainting_tpu.ops.pcm import to_pcm16
        from ml_audio_inpainting_tpu.runtime.transport import (
            composite_gap_patches_1d,
        )

        def fake_fn(variables, audio, gs, gl):
            idx = jnp.arange(audio.shape[-1])[None, :]
            in_gap = (idx >= gs[:, None]) & (idx < (gs + gl)[:, None])
            return jnp.where(in_gap, 0.25 + 0.5 * audio, audio), None

        x = jnp.asarray(np.tile(speech_like, 3))  # 15 s signal
        starts, lens = [60000, 200000], [1280, 640]
        patches, pstarts = longform_inpaint(
            fake_fn, None, x, starts, lens,
            window=80000, hop=40000, gap_fetch=2048,
        )
        assert np.asarray(patches).dtype == np.int16
        assert patches.shape == (2, 2048)
        client = composite_gap_patches_1d(
            np.asarray(to_pcm16(x)), patches, pstarts
        )
        # Recomputed reference: OLA of the full path + the same composite.
        ola = longform_inpaint(
            fake_fn, None, x, starts, lens, window=80000, hop=40000
        )
        masks = jax.vmap(
            lambda s, l: gap_mask(x.shape[-1], s, l)
        )(jnp.asarray(starts), jnp.asarray(lens))
        valid = np.asarray(jnp.min(masks, axis=0))
        ref = np.asarray(to_pcm16(np.asarray(x) * valid + np.asarray(ola) * (1 - valid)))
        # Outside every patch window: exact (client composite keeps input,
        # and ref == input there by the composite + OLA identity).
        outside = np.ones(x.shape[-1], bool)
        for s in np.asarray(pstarts):
            outside[int(s) : int(s) + 2048] = False
        np.testing.assert_array_equal(client[outside], ref[outside])
        # Inside: same value up to one int16 LSB (separately-compiled OLA
        # programs may round differently).
        assert np.max(np.abs(client.astype(np.int32) - ref.astype(np.int32))) <= 1
        # ... and the gaps were actually modified.
        for s, l in zip(starts, lens):
            assert not np.array_equal(
                client[s : s + l], np.asarray(to_pcm16(x))[s : s + l]
            )

    def test_centered_path_coords_and_exactness(self, speech_like):
        """Centered single-program path: window placement, long-signal
        coordinates, and the composite contract, validated against a
        hand-computed reference with a deterministic fake model."""
        from ml_audio_inpainting_tpu.ops.pcm import to_pcm16
        from ml_audio_inpainting_tpu.runtime.longform import (
            longform_inpaint_centered,
        )
        from ml_audio_inpainting_tpu.runtime.transport import (
            composite_gap_patches_1d,
        )

        def fake_fn(variables, audio, gs, gl):
            idx = jnp.arange(audio.shape[-1])[None, :]
            in_gap = (idx >= gs[:, None]) & (idx < (gs + gl)[:, None])
            return jnp.where(in_gap, 0.25 + 0.5 * audio, audio), None

        x = jnp.asarray(np.tile(speech_like, 3))  # 15 s
        starts, lens = [30000, 150000, 238000], [1280, 640, 1900]
        patches, pstarts = longform_inpaint_centered(
            fake_fn, None, x, starts, lens, window=80000, batch_size=4,
        )
        assert patches.shape == (3, 2048) and patches.dtype == np.int16
        client = composite_gap_patches_1d(np.asarray(to_pcm16(x)), patches, pstarts)
        # Hand-computed expected: the fake model writes 0.25 + 0.5*x inside
        # each gap (x = the window's sample values; the fake does not zero
        # the gap itself) and the composite keeps x elsewhere.
        expected = np.asarray(x).copy()
        for s, l in zip(starts, lens):
            expected[s : s + l] = 0.25 + 0.5 * expected[s : s + l]
        np.testing.assert_array_equal(client, np.asarray(to_pcm16(expected)))

    def test_centered_path_rejects_clustered_gaps(self, speech_like):
        from ml_audio_inpainting_tpu.runtime.longform import (
            longform_inpaint_centered,
        )

        import pytest

        x = jnp.asarray(np.tile(speech_like, 3))
        with pytest.raises(ValueError, match="spacing"):
            longform_inpaint_centered(
                lambda v, a, s, l: (a, None), None, x,
                [60000, 100000], [1280, 1280], window=80000,
            )

    def test_centered_path_real_model_edge_gap(self, speech_like):
        """Real (untrained) GAN program through the fused path; a gap near
        the signal start exercises the window clipping."""
        import jax as _jax

        from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
        from ml_audio_inpainting_tpu.runtime.longform import (
            longform_inpaint_centered,
        )
        from ml_audio_inpainting_tpu.train.gan_trainer import build_generator
        from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

        cfg = Config()
        cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
        cfg.data.max_len_s = 1.0
        cfg.model.generator.enc_layer_cfg = [(8, 7, 2), (16, 5, 2), (16, 3, 2)]
        cfg.model.generator.dec_layer_cfg = [(16, 3, 1), (8, 3, 1)]
        cfg.model.generator.final_interim_ch = 8
        gen = build_generator(cfg)
        F, T = 257, 16000 // 128 + 1
        variables = gen.init(
            _jax.random.PRNGKey(0), jnp.zeros((1, F, T)), jnp.ones((1, F, T)),
            train=False,
        )
        fn = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
        x = jnp.asarray(np.tile(speech_like, 2))  # 10 s
        patches, pstarts = longform_inpaint_centered(
            fn, variables, x, [2000, 100000], [1280, 1280],
            window=16000, batch_size=2,
        )
        assert np.all(np.isfinite(patches.astype(np.float32)))
        # each patch window contains its whole gap
        for (s, l), ps in zip([(2000, 1280), (100000, 1280)], pstarts):
            assert ps <= s and ps + 2048 >= s + l

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
