"""Phase-vocoder gap-phase extrapolation (``ops/phase.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.ops.phase import (
    extrapolate_phase,
    princarg,
    window_clear_frame_mask,
)
from ml_audio_inpainting_tpu.ops.stft import istft, stft

SR = 16000
KW = dict(n_fft=512, hop_length=128, win_length=512)


def _gap_sdr(clean, restored, sl):
    err = clean[sl] - restored[sl]
    return 10 * np.log10(np.sum(clean[sl] ** 2) / (np.sum(err**2) + 1e-12))


def _frame_valid(n_frames, gap_frames):
    v = np.ones((1, n_frames), np.float32)
    v[0, gap_frames] = 0.0
    return jnp.asarray(v)


class TestPrincarg:
    def test_wraps_into_band(self):
        x = jnp.asarray([0.0, 3.0, -3.0, 7.0, -7.0, 12.56])
        w = np.asarray(princarg(x))
        assert np.all(w <= np.pi + 1e-6) and np.all(w >= -np.pi - 1e-6)
        np.testing.assert_allclose(np.cos(w), np.cos(np.asarray(x)), atol=1e-6)
        np.testing.assert_allclose(np.sin(w), np.sin(np.asarray(x)), atol=1e-6)


class TestExtrapolatePhase:
    def test_valid_frames_pass_through(self):
        rng = np.random.default_rng(0)
        ph = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 257, 40)).astype(np.float32))
        fv = jnp.ones((2, 40))
        out = extrapolate_phase(ph, fv, KW["hop_length"], KW["n_fft"])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ph))

    @pytest.mark.parametrize("freqs", [(440.0,), (437.3, 1213.7, 2791.1)])
    def test_sinusoid_phase_recovered_through_gap(self, freqs):
        """For stationary partials (including off-bin ones), extrapolated
        phase + true magnitude must reconstruct the gap far better than the
        zero-phase (impaired) baseline."""
        t = np.arange(SR * 2) / SR
        x = sum(np.sin(2 * np.pi * f * t + 0.7 * i) for i, f in enumerate(freqs))
        x = (x / np.max(np.abs(x))).astype(np.float32)
        audio = jnp.asarray(x)[None]

        spec = stft(audio, **KW)
        mag = jnp.abs(spec)
        n_frames = spec.shape[-1]

        gs, ge = 16000, 16000 + 1280  # 80 ms gap @ 1.0 s
        gap_frames = np.arange(gs // KW["hop_length"] - 1,
                               ge // KW["hop_length"] + 2)
        fv = _frame_valid(n_frames, gap_frames)

        # Impaired phase: true phase outside gap frames, zero inside.
        ph_true = jnp.angle(spec)
        ph_imp = ph_true * fv[:, None, :]

        sl = slice(gs, ge)
        rec_imp = np.asarray(
            istft(mag * jnp.exp(1j * ph_imp), length=len(x), **KW)
        )[0]
        ext = extrapolate_phase(ph_imp, fv, KW["hop_length"], KW["n_fft"])
        rec_ext = np.asarray(
            istft(mag * jnp.exp(1j * ext), length=len(x), **KW)
        )[0]

        sdr_imp = _gap_sdr(x, rec_imp, sl)
        sdr_ext = _gap_sdr(x, rec_ext, sl)
        # Extrapolation should essentially solve stationary content.
        assert sdr_ext > sdr_imp + 10.0, (sdr_imp, sdr_ext)
        assert sdr_ext > 15.0, sdr_ext

    def test_one_sided_extrapolation_at_clip_edge(self):
        """A gap at the very start has no left boundary: the right-sided
        estimate must be used and remain finite."""
        t = np.arange(SR) / SR
        x = np.sin(2 * np.pi * 523.0 * t).astype(np.float32)
        audio = jnp.asarray(x)[None]
        spec = stft(audio, **KW)
        n_frames = spec.shape[-1]
        gap_frames = np.arange(0, 12)
        fv = _frame_valid(n_frames, gap_frames)
        ph_imp = jnp.angle(spec) * fv[:, None, :]
        ext = extrapolate_phase(ph_imp, fv, KW["hop_length"], KW["n_fft"])
        out = np.asarray(ext)
        assert np.all(np.isfinite(out))
        rec = np.asarray(
            istft(jnp.abs(spec) * jnp.exp(1j * ext), length=len(x), **KW)
        )[0]
        assert _gap_sdr(x, rec, slice(0, 1280)) > 3.0

    def test_close_gaps_fall_back_to_nominal_advance(self):
        """Two gaps separated by a single valid frame: the boundary-pair
        measurement would cross a gap frame -- the fallback must keep the
        output finite and the valid frames untouched."""
        rng = np.random.default_rng(1)
        ph = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, 65, 24)).astype(np.float32))
        fv = np.ones((1, 24), np.float32)
        fv[0, 5:9] = 0.0
        fv[0, 10:14] = 0.0  # frame 9 is a lone valid island
        fv = jnp.asarray(fv)
        out = np.asarray(extrapolate_phase(ph, fv, 128, 512))
        assert np.all(np.isfinite(out))
        np.testing.assert_array_equal(
            out[0][:, np.asarray(fv[0]) > 0], np.asarray(ph)[0][:, np.asarray(fv[0]) > 0]
        )


class TestWindowClearFrameMask:
    def test_stricter_than_center_rule(self):
        """A frame whose center is outside the gap but whose window overlaps
        it must be rejected (that phase derives from lost samples)."""
        S, hop, n_fft = 16000, 128, 512
        sv = np.ones((1, S), np.float32)
        sv[0, 8000:9280] = 0.0
        n_frames = 126
        m = np.asarray(window_clear_frame_mask(jnp.asarray(sv), n_frames, hop, n_fft))
        centers = np.arange(n_frames) * hop
        # Frames with windows fully clear of [8000, 9280):
        expect = (centers + n_fft // 2 <= 8000) | (centers - n_fft // 2 >= 9280)
        np.testing.assert_array_equal(m[0] > 0.5, expect)
        # strictly fewer trusted frames than the center-only rule
        center_rule = (centers < 8000) | (centers >= 9280)
        assert (m[0] > 0.5).sum() < center_rule.sum()

    def test_all_valid(self):
        m = window_clear_frame_mask(jnp.ones((2, 4000)), 30, 128, 512)
        np.testing.assert_array_equal(np.asarray(m), 1.0)

    def test_jit_and_vmap_safe(self):
        ph = jnp.zeros((3, 65, 20))
        fv = jnp.ones((3, 20)).at[:, 8:11].set(0.0)
        out = jax.jit(
            lambda p, v: extrapolate_phase(p, v, 128, 512)
        )(ph, fv)
        assert out.shape == ph.shape
        assert np.all(np.isfinite(np.asarray(out)))
