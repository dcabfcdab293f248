"""Time-domain refinement stack: the ops/refine solvers' contracts and the
learned head's load-bearing properties (zero-init == AR fill; hard data
consistency; train step improves its own objective)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.ops.refine import (
    consistent_reconstruct,
    magnitude_descent,
)
from ml_audio_inpainting_tpu.ops.stft import stft

KW = dict(n_fft=256, hop_length=64, win_length=256)
SR = 16000


@pytest.fixture(scope="module")
def gap_setup(rng_module):
    rng = rng_module
    t = np.arange(16000) / SR
    clean = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.25 * np.sin(2 * np.pi * 440 * t + 0.7)
    ).astype(np.float32)
    clean = clean[None]
    valid = np.ones_like(clean)
    valid[:, 8000:8640] = 0.0
    return jnp.asarray(clean), jnp.asarray(valid)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


class TestConsistentReconstruct:
    def test_observed_samples_exact(self, gap_setup):
        clean, valid = gap_setup
        observed = clean * valid
        mag = jnp.abs(stft(clean, **KW))
        out = consistent_reconstruct(
            mag, observed, valid, jnp.zeros_like(observed), n_iter=8, **KW
        )
        np.testing.assert_array_equal(
            np.asarray(out)[np.asarray(valid) > 0.5],
            np.asarray(observed)[np.asarray(valid) > 0.5],
        )

    def test_oracle_magnitude_recovers_gap(self, gap_setup):
        """With the TRUE magnitude and per-iteration data consistency, the
        projection must substantially reconstruct a tonal gap."""
        clean, valid = gap_setup
        observed = clean * valid
        mag = jnp.abs(stft(clean, **KW))
        out = consistent_reconstruct(
            mag, observed, valid, observed, n_iter=400, **KW
        )
        g = slice(8000, 8640)
        err = np.asarray(out)[:, g] - np.asarray(clean)[:, g]
        ref = np.asarray(clean)[:, g]
        sdr = 10 * np.log10((ref**2).sum() / (err**2).sum())
        # converges slowly but essentially exactly (~57 dB at 400 iters)
        assert sdr > 20.0, sdr

    def test_rejects_bad_params(self, gap_setup):
        clean, valid = gap_setup
        with pytest.raises(ValueError):
            consistent_reconstruct(
                jnp.abs(stft(clean, **KW)), clean * valid, valid,
                jnp.zeros_like(clean), n_iter=1, momentum=1.5, **KW
            )
        with pytest.raises(ValueError):
            consistent_reconstruct(
                jnp.abs(stft(clean, **KW)), clean * valid, valid,
                jnp.zeros_like(clean), n_iter=1, beta=2.0, **KW
            )


class TestMagnitudeDescent:
    def test_observed_samples_exact_and_descends(self, gap_setup):
        clean, valid = gap_setup
        observed = clean * valid
        mag = jnp.abs(stft(clean, **KW))
        out = magnitude_descent(
            mag, observed, valid, observed, n_steps=30, lr=0.01, **KW
        )
        np.testing.assert_array_equal(
            np.asarray(out)[np.asarray(valid) > 0.5],
            np.asarray(observed)[np.asarray(valid) > 0.5],
        )
        # magnitude fit must improve over the zero-fill start
        def fit(x):
            return float(jnp.mean((jnp.log1p(jnp.abs(stft(x, **KW))) - jnp.log1p(mag)) ** 2))

        assert fit(out) < fit(observed)


class TestWaveRefinerHead:
    @pytest.fixture(scope="class")
    def tiny(self):
        from ml_audio_inpainting_tpu.models.refiner import WaveRefiner

        model = WaveRefiner(channels=8, dilations=(1, 2, 4))
        z = jnp.zeros((1, 512))
        variables = model.init(jax.random.PRNGKey(0), z, z, z, z)
        return model, variables

    def test_zero_init_is_identity_on_ar_fill(self, tiny):
        model, variables = tiny
        rng = np.random.default_rng(1)
        imp = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
        ar = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
        ne = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
        ind = jnp.zeros((2, 512)).at[:, 200:300].set(1.0)
        out = model.apply(variables, imp, ar, ne, ind)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(imp * (1 - ind) + ar * ind), atol=1e-6
        )

    def test_composite_hard_outside_gap(self, tiny):
        model, variables = tiny
        # after a parameter perturbation the gap changes but NOT the rest
        perturbed = jax.tree_util.tree_map(
            lambda p: p + 0.05, variables["params"]
        )
        rng = np.random.default_rng(2)
        imp = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
        ar = imp + 0.1
        ne = imp - 0.1
        ind = jnp.zeros((1, 512)).at[:, 100:200].set(1.0)
        out = np.asarray(model.apply({"params": perturbed}, imp, ar, ne, ind))
        np.testing.assert_array_equal(out[:, :100], np.asarray(imp)[:, :100])
        np.testing.assert_array_equal(out[:, 200:], np.asarray(imp)[:, 200:])
        assert not np.allclose(out[:, 100:200], np.asarray(ar)[:, 100:200])
