"""Edge-case coverage: non-centered STFT, mel inversion, GL init modes,
batch iterator semantics, synthetic dataset determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
from ml_audio_inpainting_tpu.data.pipeline import batch_iterator, prefetch_to_device
from ml_audio_inpainting_tpu.ops import griffinlim, istft, mel_to_audio, mel_spectrogram, stft


class TestSTFTEdges:
    def test_non_centered_roundtrip(self, test_signals):
        y = jnp.asarray(test_signals["sine_combo"])
        spec = stft(y, n_fft=512, hop_length=128, center=False)
        rec = istft(spec, n_fft=512, hop_length=128, center=False)
        # non-centered iSTFT covers [0, n_fft + hop*(N-1)); interior matches
        n = rec.shape[-1]
        np.testing.assert_allclose(
            np.asarray(rec[512:-512]), np.asarray(y[512 : n - 512]), atol=1e-4
        )

    def test_odd_length_signal(self):
        y = jnp.asarray(np.random.default_rng(0).standard_normal(12345), jnp.float32)
        spec = stft(y, n_fft=256, hop_length=64)
        rec = istft(spec, n_fft=256, hop_length=64, length=12345)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(y), atol=1e-4)

    def test_griffinlim_ones_init(self, test_signals):
        y = test_signals["sine"]
        mag = jnp.abs(stft(jnp.asarray(y), n_fft=512, hop_length=128))
        rec = griffinlim(mag, n_iter=8, n_fft=512, hop_length=128, init="ones", length=len(y))
        assert np.all(np.isfinite(np.asarray(rec)))

    def test_mel_inversion_roundtrip(self, test_signals):
        y = test_signals["sine_combo"]
        m = mel_spectrogram(jnp.asarray(y), sample_rate=16000, n_fft=512, hop_length=128, n_mels=128)
        rec = mel_to_audio(
            m, sample_rate=16000, n_fft=512, hop_length=128, n_iter=8, n_mels=128,
            key=jax.random.PRNGKey(0),
        )
        assert rec.ndim == 1 and np.all(np.isfinite(np.asarray(rec)))
        # tonal content survives mel round trip: spectral corr on magnitudes
        a = np.asarray(jnp.abs(stft(jnp.asarray(y[: rec.shape[0]]), n_fft=512, hop_length=128)))
        b = np.asarray(jnp.abs(stft(rec, n_fft=512, hop_length=128)))
        n = min(a.shape[1], b.shape[1])
        c = np.corrcoef(a[:, :n].ravel(), b[:, :n].ravel())[0, 1]
        assert c > 0.5, c


class TestPipeline:
    def test_drop_last(self):
        ds = [np.full(4, i, np.float32) for i in range(5)]
        batches = list(batch_iterator(ds, 2, shuffle=False, epochs=1))
        assert len(batches) == 2  # 5 items, batch 2, drop_last

    def test_keep_last(self):
        ds = [np.full(4, i, np.float32) for i in range(5)]
        batches = list(batch_iterator(ds, 2, shuffle=False, epochs=1, drop_last=False))
        assert len(batches) == 3 and batches[-1].shape[0] == 1

    def test_epochs_and_shuffle_determinism(self):
        ds = [np.full(2, i, np.float32) for i in range(4)]
        a = [b[:, 0].tolist() for b in batch_iterator(ds, 2, seed=1, epochs=2)]
        b = [b[:, 0].tolist() for b in batch_iterator(ds, 2, seed=1, epochs=2)]
        assert a == b and len(a) == 4

    def test_workers_match_serial_batches(self):
        """The thread-pool decode path must produce byte-identical batches
        in the same order as the serial path (the workers only hide decode
        latency, they never reorder)."""
        ds = [np.full(4, i, np.float32) for i in range(23)]
        serial = list(batch_iterator(ds, 4, shuffle=True, seed=3, epochs=2))
        pooled = list(batch_iterator(ds, 4, shuffle=True, seed=3, epochs=2, workers=4))
        assert len(serial) == len(pooled)
        for a, b in zip(serial, pooled):
            np.testing.assert_array_equal(a, b)

    def test_workers_propagate_decode_errors(self):
        class Exploding:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i == 5:
                    raise ValueError("bad item")
                return np.zeros(4, np.float32)

        with pytest.raises(ValueError, match="bad item"):
            list(batch_iterator(Exploding(), 2, shuffle=False, epochs=1, workers=3))

    def test_device_feed_matches_streamed_feed(self):
        """The device-resident gather feed must reproduce the streamed
        feed's batches exactly (same per-epoch shuffle, same drop_last),
        so switching --feed never changes a run's data order."""
        from ml_audio_inpainting_tpu.data.pipeline import device_corpus_feed

        ds = [np.full(6, i, np.float32) for i in range(11)]
        streamed = list(batch_iterator(ds, 4, shuffle=True, seed=7, epochs=2))
        resident = [np.asarray(b) for b in device_corpus_feed(ds, 4, seed=7, epochs=2)]
        assert len(streamed) == len(resident)
        for a, b in zip(streamed, resident):
            np.testing.assert_array_equal(a, b)

    def test_device_feed_sharded(self):
        """With a batch sharding the gathered batches land pre-sharded on
        the mesh and still match the streamed ordering."""
        import jax

        from ml_audio_inpainting_tpu.data.pipeline import device_corpus_feed
        from ml_audio_inpainting_tpu.parallel.mesh import batch_sharding, make_mesh

        mesh = make_mesh()
        ds = [np.full(8, i, np.float32) for i in range(16)]
        sh = batch_sharding(mesh)
        got = list(device_corpus_feed(ds, 8, seed=0, epochs=1, sharding=sh))
        want = list(batch_iterator(ds, 8, shuffle=True, seed=0, epochs=1))
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert a.sharding.is_equivalent_to(sh, a.ndim)
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_prefetch_preserves_order_and_raises(self):
        def gen():
            yield np.zeros(3)
            yield np.ones(3)
            raise RuntimeError("boom")

        it = prefetch_to_device(gen(), size=1)
        out = [np.asarray(next(it)), np.asarray(next(it))]
        np.testing.assert_array_equal(out[0], 0)
        np.testing.assert_array_equal(out[1], 1)
        try:
            next(it)
            assert False, "expected RuntimeError"
        except RuntimeError as e:
            assert "boom" in str(e)


class TestSyntheticDataset:
    def test_deterministic_per_index(self):
        a = SyntheticSpeechDataset(4, seed=7)
        b = SyntheticSpeechDataset(4, seed=7)
        np.testing.assert_array_equal(a[2], b[2])
        assert not np.array_equal(a[1], a[2])

    def test_contract_shape(self):
        ds = SyntheticSpeechDataset(1, max_len_s=5.0)
        x = ds[0]
        assert x.shape == (80000,) and x.dtype == np.float32
        assert np.max(np.abs(x)) <= 1.0
