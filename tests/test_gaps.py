"""Gap-engine tests (reference: ``tests/utils_test.py:216-255`` style)."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.ops import (
    apply_gap,
    composite,
    frame_mask_from_interval,
    invert_mask,
    log1p_denorm,
    log1p_norm,
    log10_denorm,
    log10_norm,
    random_gap_mask,
)

SR = 16000


class TestGapMask:
    def test_fixed_position(self):
        mask, (s, e) = random_gap_mask(jax.random.PRNGKey(0), 80000, 0.08, SR, gap_start_s=2.0)
        assert int(s) == 32000 and int(e) == 32000 + 1280
        m = np.asarray(mask)
        assert m[31999] == 1.0 and m[32000] == 0.0 and m[33279] == 0.0 and m[33280] == 1.0
        assert m.sum() == 80000 - 1280

    def test_random_position_in_range(self):
        for i in range(8):
            mask, (s, e) = random_gap_mask(jax.random.PRNGKey(i), 80000, 0.2, SR)
            assert 0 <= int(s) <= 80000 - 3200
            assert int(e) - int(s) == 3200
            assert float(mask.sum()) == 80000 - 3200

    def test_zero_gap(self):
        mask, (s, e) = random_gap_mask(jax.random.PRNGKey(0), 1000, 0.0, SR)
        assert float(mask.sum()) == 1000 and int(s) == int(e) == 0

    def test_gap_covers_everything(self):
        mask, (s, e) = random_gap_mask(jax.random.PRNGKey(0), 100, 1.0, SR)
        assert float(mask.sum()) == 0

    def test_silence_inside_gap(self, speech_like):
        y = jnp.asarray(speech_like)
        mask, (s, e) = random_gap_mask(jax.random.PRNGKey(5), y.shape[0], 0.2, SR)
        gapped = apply_gap(y, mask)
        g = np.asarray(gapped)
        assert np.all(g[int(s) : int(e)] == 0)
        np.testing.assert_array_equal(g[: int(s)], np.asarray(y)[: int(s)])

    def test_vmapped_batch(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 25)
        masks, (starts, ends) = jax.vmap(
            lambda k: random_gap_mask(k, 80000, 0.2, SR)
        )(keys)
        assert masks.shape == (25, 80000)
        assert len(set(np.asarray(starts).tolist())) > 1  # actually random


class TestFrameMaskFromSampleMask:
    """The multi-gap generalization must reduce EXACTLY to the reference's
    per-interval rules for a single gap."""

    def test_any_rule_matches_floor_ceil(self):
        import jax.numpy as jnp

        from ml_audio_inpainting_tpu.ops.gaps import (
            frame_mask_from_interval,
            frame_mask_from_sample_mask,
            gap_mask,
        )

        F, N, hop, n = 5, 126, 64, 8000
        for s, l in [(0, 64), (100, 300), (63, 65), (7936, 64), (128, 1), (500, 0)]:
            tmask = gap_mask(n, jnp.asarray(s), jnp.asarray(l))
            a = frame_mask_from_interval(jnp.asarray(s), jnp.asarray(s + l), F, N, hop)
            b = frame_mask_from_sample_mask(tmask, F, N, hop, rule="any")
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"{s},{l}")

    def test_end_rule_matches_floor_floor(self):
        import jax.numpy as jnp

        from ml_audio_inpainting_tpu.ops.gaps import (
            frame_mask_from_sample_mask,
            gap_mask,
        )

        F, N, hop, n = 3, 126, 64, 8000
        for s, l in [(0, 64), (100, 300), (63, 65), (128, 192)]:
            tmask = gap_mask(n, jnp.asarray(s), jnp.asarray(l))
            got = np.asarray(
                frame_mask_from_sample_mask(tmask, F, N, hop, rule="end")
            )[0]
            t = np.arange(N)
            expect = np.where((t >= s // hop) & (t < (s + l) // hop), 0.0, 1.0)
            np.testing.assert_array_equal(got, expect, err_msg=f"{s},{l}")

    def test_multi_gap_batched(self):
        import jax
        import jax.numpy as jnp

        from ml_audio_inpainting_tpu.data.multigap import multi_gap_mask
        from ml_audio_inpainting_tpu.ops.gaps import frame_mask_from_sample_mask

        masks, _, _ = jax.vmap(
            lambda k: multi_gap_mask(k, 16000, 3, sample_rate=16000)
        )(jax.random.split(jax.random.PRNGKey(0), 2))
        fm = frame_mask_from_sample_mask(masks, 4, 126, 128, rule="any")
        assert fm.shape == (2, 4, 126)
        # each clip: some holes, not all holes
        holes = (np.asarray(fm)[:, 0] == 0).sum(axis=-1)
        assert (holes > 0).all() and (holes < 126).all()


class TestFrameMask:
    def test_floor_ceil_rule(self):
        """Frame coverage must match models/GAN/dataset.py:138-152."""
        hop = 128
        s, e = 32000, 33280
        fm = frame_mask_from_interval(jnp.asarray(s), jnp.asarray(e), 257, 626, hop)
        m = np.asarray(fm)
        start_f, end_f = s // hop, int(np.ceil(e / hop))
        assert np.all(m[:, start_f:end_f] == 0)
        assert np.all(m[:, :start_f] == 1) and np.all(m[:, end_f:] == 1)

    def test_unaligned_interval(self):
        hop = 192
        s, e = 1000, 1100
        fm = frame_mask_from_interval(jnp.asarray(s), jnp.asarray(e), 257, 417, hop)
        m = np.asarray(fm)
        assert np.all(m[:, 1000 // 192 : int(np.ceil(1100 / 192))] == 0)

    def test_empty_interval_is_all_valid(self):
        fm = frame_mask_from_interval(jnp.asarray(10), jnp.asarray(10), 4, 8, 2)
        assert float(fm.sum()) == 32


class TestNormalizations:
    def test_log1p_inverse(self):
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (16, 16)))
        np.testing.assert_allclose(
            np.asarray(log1p_denorm(log1p_norm(x))), np.asarray(x), rtol=1e-3, atol=1e-5
        )

    def test_log10_inverse(self):
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (16, 16))) + 0.1
        np.testing.assert_allclose(
            np.asarray(log10_denorm(log10_norm(x))), np.asarray(x) + 1e-9, rtol=1e-4
        )

    def test_composite(self):
        pred = jnp.full((4, 4), 7.0)
        orig = jnp.full((4, 4), 1.0)
        valid = jnp.ones((4, 4)).at[:, 2].set(0.0)
        out = np.asarray(composite(pred, orig, valid))
        assert np.all(out[:, 2] == 7.0)
        assert np.all(out[:, [0, 1, 3]] == 1.0)

    def test_invert_mask(self):
        m = jnp.asarray([0.0, 1.0])
        np.testing.assert_array_equal(np.asarray(invert_mask(m)), [1.0, 0.0])
