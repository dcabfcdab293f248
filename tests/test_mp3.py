"""MP3 decode through the native codec layer.

The reference advertises ``.mp3`` in ``SUPPORTED_FORMATS``
(``config.py:36``) and decodes it through librosa -> audioread -> a system
codec (``utils.py:14-52``).  This framework binds the system codec
(libmpg123) inside ``native/audioio.cpp`` -- same architecture, same
boundary.  Validation oracle: pygame's SDL_mixer, which ships its own
separately built decoder.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

from ml_audio_inpainting_tpu.data.audio_io import (
    AudioIOError,
    load_audio,
    read_audio,
)

MP3_SAMPLE = Path(
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"
)

pytestmark = pytest.mark.skipif(
    not MP3_SAMPLE.exists(), reason="no MP3 sample on this host"
)


class TestMP3Decode:
    def test_decodes_native_format(self):
        audio, rate, md5_ok = read_audio(MP3_SAMPLE)
        assert rate == 11025
        assert md5_ok == -1  # MD5 verify is a FLAC-only concept
        assert audio.shape[0] > 70000
        assert float(np.abs(audio).max()) > 0.5

    def test_matches_independent_decoder(self):
        """Sample-exactness vs SDL_mixer's own decoder build (different
        binary, same spec)."""
        pygame = pytest.importorskip("pygame")
        import os

        os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
        audio, rate, _ = read_audio(MP3_SAMPLE)
        ours = audio[:, 0] if audio.ndim == 2 else audio
        try:
            pygame.mixer.init(frequency=rate, channels=1)
        except pygame.error:
            pytest.skip("SDL mixer unavailable")
        import pygame.sndarray as sa

        theirs = sa.array(pygame.mixer.Sound(str(MP3_SAMPLE)))
        theirs = (theirs[:, 0] if theirs.ndim == 2 else theirs).astype(
            np.float32
        ) / 32768.0
        n = min(len(ours), len(theirs))
        corr = float(np.corrcoef(ours[:n], theirs[:n])[0, 1])
        assert corr > 0.9999, corr

    def test_load_audio_contract(self):
        """load_audio applies the 16 kHz / fixed-length audio contract to
        MP3 exactly as to FLAC (reference utils.py:39-48)."""
        audio, sr = load_audio(MP3_SAMPLE, sample_rate=16000, max_len=5.0)
        assert sr == 16000
        assert np.asarray(audio).shape == (80000,)

    def test_garbage_with_id3_header_raises(self, tmp_path):
        bad = tmp_path / "bad.mp3"
        rng = np.random.default_rng(0)
        bad.write_bytes(b"ID3\x04\x00\x00\x00\x00\x00\x00" + rng.bytes(4096))
        with pytest.raises(AudioIOError):
            read_audio(bad)

    def test_empty_mp3_raises(self, tmp_path):
        bad = tmp_path / "empty.mp3"
        bad.write_bytes(b"")
        with pytest.raises(AudioIOError):
            read_audio(bad)

    def test_truncated_stream_still_decodes_prefix(self, tmp_path):
        """mpg123 is resilient to truncation: a half file must either decode
        a shorter prefix or raise cleanly -- never crash or hang."""
        data = MP3_SAMPLE.read_bytes()
        cut = tmp_path / "cut.mp3"
        cut.write_bytes(data[: len(data) // 2])
        try:
            audio, rate, _ = read_audio(cut)
            assert 0 < audio.shape[0] <= 80064
            assert rate == 11025
        except AudioIOError:
            pass

    def test_extension_spoofing_is_irrelevant(self, tmp_path):
        """Dispatch is by content, not extension (like the reference's
        librosa path)."""
        alias = tmp_path / "speech.wav"
        shutil.copyfile(MP3_SAMPLE, alias)
        audio, rate, _ = read_audio(alias)
        assert rate == 11025
        assert audio.shape[0] > 70000
