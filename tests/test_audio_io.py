"""Native codec tests: FLAC round trips with MD5 verification, WAV, the
load/save behavioral contract (reference: ``tests/utils_test.py:149-212``,
``:494-547``)."""

import numpy as np
import pytest

from ml_audio_inpainting_tpu.data.audio_io import (
    AudioIOError,
    load_audio,
    read_audio,
    resample,
    save_audio,
    write_audio,
)

SR = 16000

REFERENCE_SAMPLES = "/root/reference/test_samples"


@pytest.fixture
def sine(rng):
    t = np.arange(SR) / SR
    return (0.5 * np.sin(2 * np.pi * 440 * t) + 0.25 * np.sin(2 * np.pi * 880 * t)).astype(
        np.float32
    )


class TestFlacCodec:
    def test_roundtrip_mono(self, tmp_path, sine):
        path = tmp_path / "a.flac"
        write_audio(path, sine, SR)
        out, rate, md5_ok = read_audio(path)
        assert rate == SR and md5_ok == 1
        assert out.shape == (len(sine), 1)
        # 16-bit quantization bound
        np.testing.assert_allclose(out[:, 0], sine, atol=1.1 / 32768)

    def test_roundtrip_stereo(self, tmp_path, sine):
        stereo = np.stack([sine, -sine], axis=1)
        path = tmp_path / "s.flac"
        write_audio(path, stereo, SR)
        out, rate, md5_ok = read_audio(path)
        assert md5_ok == 1 and out.shape == stereo.shape
        np.testing.assert_allclose(out, stereo, atol=1.1 / 32768)

    def test_noise_roundtrip(self, tmp_path, rng):
        noise = rng.standard_normal(48001).astype(np.float32)  # odd length
        noise /= np.max(np.abs(noise))  # keep within [-1, 1] to avoid clipping
        path = tmp_path / "n.flac"
        write_audio(path, noise, SR)
        out, _, md5_ok = read_audio(path)
        assert md5_ok == 1
        np.testing.assert_allclose(out[:, 0], noise, atol=1.1 / 32768)

    @pytest.mark.skipif(
        not __import__("os").path.isdir(REFERENCE_SAMPLES), reason="reference not mounted"
    )
    def test_reference_samples_md5_verified(self):
        """Decode every bundled LibriSpeech eval clip; the FLAC STREAMINFO MD5
        must match our decode exactly (proves full decoder correctness)."""
        import glob

        files = sorted(glob.glob(f"{REFERENCE_SAMPLES}/*.flac"))
        assert len(files) == 9
        for f in files:
            out, rate, md5_ok = read_audio(f)
            assert rate == SR
            assert md5_ok == 1, f"MD5 mismatch decoding {f}"
            assert np.max(np.abs(out)) <= 1.0


class TestWavCodec:
    def test_roundtrip(self, tmp_path, sine):
        path = tmp_path / "a.wav"
        write_audio(path, sine, SR, file_format="wav")
        out, rate, md5_ok = read_audio(path)
        assert rate == SR and md5_ok == -1
        np.testing.assert_allclose(out[:, 0], sine, atol=1.1 / 32768)


class TestLoadSaveContract:
    def test_load_pads_to_max_len(self, tmp_path, sine):
        path = tmp_path / "short.flac"
        write_audio(path, sine, SR)  # 1 s file
        audio, sr = load_audio(path, sample_rate=SR, max_len=5.0)
        assert audio.shape == (80000,)
        assert np.all(audio[16000:] == 0)

    def test_load_truncates(self, tmp_path, rng):
        long = (rng.standard_normal(7 * SR) * 0.1).astype(np.float32)
        path = tmp_path / "long.flac"
        write_audio(path, long, SR)
        audio, _ = load_audio(path, sample_rate=SR, max_len=5.0)
        assert audio.shape == (80000,)

    def test_load_stereo_to_mono(self, tmp_path, sine):
        path = tmp_path / "st.flac"
        write_audio(path, np.stack([sine, np.zeros_like(sine)], 1), SR)
        audio, _ = load_audio(path, max_len=1.0)
        np.testing.assert_allclose(audio, sine / 2, atol=2 / 32768)

    def test_load_missing_raises_ioerror(self, tmp_path):
        with pytest.raises(IOError):
            load_audio(tmp_path / "nope.flac")

    def test_save_normalizes(self, tmp_path, sine):
        path = tmp_path / "out" / "norm.flac"  # exercises auto-mkdir
        save_audio(0.1 * sine, path, SR, normalize=True)
        out, _, _ = read_audio(path)
        assert abs(np.max(np.abs(out)) - 1.0) < 1e-3

    def test_save_no_normalize(self, tmp_path, sine):
        path = tmp_path / "raw.flac"
        save_audio(0.1 * sine, path, SR, normalize=False)
        out, _, _ = read_audio(path)
        np.testing.assert_allclose(out[:, 0], 0.1 * sine, atol=1.1 / 32768)

    def test_save_unwritable_raises(self, sine):
        with pytest.raises(IOError):
            save_audio(sine, "/proc/definitely/not/writable.flac", SR)

    def test_resample(self, sine):
        up = resample(sine, SR, 2 * SR)
        assert len(up) == 2 * len(sine)
        down = resample(up, 2 * SR, SR)
        np.testing.assert_allclose(down[100:-100], sine[100:-100], atol=5e-3)
