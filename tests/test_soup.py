"""Model-soup utility: weighted checkpoint averaging (cli/soup.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.cli.soup import main as soup_main
from ml_audio_inpainting_tpu.cli.soup import soup_params
from ml_audio_inpainting_tpu.train.checkpoints import (
    export_params_npz,
    load_params_npz,
)


def _tree(scale):
    return {
        "params": {"conv": {"kernel": jnp.full((3, 3), scale, jnp.float32)}},
        "batch_stats": {"norm": {"mean": jnp.full((4,), 2.0 * scale, jnp.float32)}},
    }


class TestSoupParams:
    def test_uniform_average(self):
        out = soup_params([_tree(1.0), _tree(3.0)])
        np.testing.assert_allclose(out["params"]["conv"]["kernel"], 2.0)
        np.testing.assert_allclose(out["batch_stats"]["norm"]["mean"], 4.0)

    def test_weights_normalized(self):
        out = soup_params([_tree(0.0), _tree(1.0)], weights=[1.0, 3.0])
        np.testing.assert_allclose(out["params"]["conv"]["kernel"], 0.75)

    def test_structure_mismatch_rejected(self):
        other = {"params": {"other": jnp.zeros((2,))}}
        with pytest.raises(ValueError, match="structure"):
            soup_params([_tree(1.0), other])

    def test_negative_weight_rejected(self):
        """Extrapolated (non-convex) soups can produce negative BN variances
        -> NaNs at inference; refuse them."""
        with pytest.raises(ValueError, match="non-negative"):
            soup_params([_tree(1.0), _tree(2.0)], weights=[2.0, -1.0])

    def test_wrong_weight_count(self):
        with pytest.raises(ValueError, match="weights"):
            soup_params([_tree(1.0), _tree(2.0)], weights=[1.0])

    def test_single_input_rejected(self):
        with pytest.raises(ValueError, match="two"):
            soup_params([_tree(1.0)])


class TestSoupCLI:
    def test_roundtrip(self, tmp_path):
        a, b, out = tmp_path / "a.npz", tmp_path / "b.npz", tmp_path / "s.npz"
        export_params_npz(a, _tree(1.0), dtype=None)
        export_params_npz(b, _tree(3.0), dtype=None)
        soup_main([str(out), str(a), str(b), "--weights", "0.25", "0.75",
                   "--dtype", "float32"])
        souped = load_params_npz(out)
        np.testing.assert_allclose(
            np.asarray(souped["params"]["conv"]["kernel"]), 2.5
        )
