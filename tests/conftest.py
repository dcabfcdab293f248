"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI, so the mesh/sharding tests run
against ``--xla_force_host_platform_device_count=8`` on CPU, per the test
strategy in SURVEY.md §4.  Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin registers itself from sitecustomize before conftest
# runs, overriding JAX_PLATFORMS -- force the CPU platform back explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def test_signals(rng):
    """Synthetic signals with known properties, mirroring the reference's
    fixture style (``tests/utils_test.py:114-145``): sine, sine combo, chirp,
    impulse train, white noise."""
    sr = 16000
    dur = 1.0
    t = np.arange(int(sr * dur)) / sr
    return {
        "sine": np.sin(2 * np.pi * 440 * t).astype(np.float32),
        "sine_combo": (
            0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 880 * t)
        ).astype(np.float32),
        "chirp": np.sin(2 * np.pi * (200 + (2000 - 200) * t / (2 * dur)) * t).astype(np.float32),
        "impulse_train": np.tile(
            np.concatenate([[1.0], np.zeros(799)]), int(sr * dur) // 800
        ).astype(np.float32),
        "noise": rng.standard_normal(int(sr * dur)).astype(np.float32) * 0.1,
    }


@pytest.fixture
def speech_like(rng):
    """A 5 s, 16 kHz speech-like signal (AM-modulated harmonic stack + noise
    floor) padded/trimmed to exactly 80 000 samples -- the framework's audio
    contract (SURVEY.md §2.7)."""
    sr = 16000
    t = np.arange(5 * sr) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = sum((0.5 / k) * np.sin(k * phase) for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t))
    sig = env * sig + 0.01 * rng.standard_normal(len(t))
    return (sig / np.max(np.abs(sig))).astype(np.float32)
