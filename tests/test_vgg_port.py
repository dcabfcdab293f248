"""VGG19 torch-weight conversion: ``load_torch_vgg19`` must reproduce a
torch VGG19-features forward pass, so real torchvision weights
(``vgg19-dcbb9e9d.pth`` via ``MAI_VGG19_WEIGHTS``) are drop-in ready.

The environment has no torchvision and no network, so the test builds a
shape-correct random torch ``state_dict`` with torchvision's
``features.N.{weight,bias}`` layout (reference ``models/GAN/loss.py:15-38``
consumes exactly that stack) and compares against a local torch replica.
"""

import numpy as np
import pytest


def _torch_vgg19_features():
    """torchvision ``vgg19().features`` replica (conv/relu/pool indices per
    ``VGG19_CONV_LAYERS`` / ``VGG19_POOL_LAYERS``)."""
    import torch.nn as nn

    from ml_audio_inpainting_tpu.models.vgg import (
        VGG19_CONV_LAYERS,
        VGG19_POOL_LAYERS,
    )

    layers = []
    max_idx = max(max(VGG19_CONV_LAYERS), max(VGG19_POOL_LAYERS))
    for idx in range(max_idx + 1):
        if idx in VGG19_CONV_LAYERS:
            in_c, out_c = VGG19_CONV_LAYERS[idx]
            layers.append(nn.Conv2d(in_c, out_c, 3, padding=1))
        elif idx in VGG19_POOL_LAYERS:
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.ReLU(inplace=False))
    return nn.Sequential(*layers)


class TestVGGPort:
    def test_state_dict_round_trip_matches_torch(self, tmp_path):
        import jax.numpy as jnp
        import torch

        from ml_audio_inpainting_tpu.models.vgg import (
            PERCEPTUAL_LAYERS,
            STYLE_LAYERS,
            vgg19_params,
        )

        torch.manual_seed(0)
        features = _torch_vgg19_features()
        # Small random weights keep the 16-conv composition numerically tame.
        with torch.no_grad():
            for m in features:
                if isinstance(m, torch.nn.Conv2d):
                    m.weight.mul_(0.05)
                    m.bias.normal_(std=0.05)
        sd = {f"features.{i}.{k}": v for i, m in enumerate(features)
              for k, v in m.state_dict().items()}
        path = tmp_path / "vgg19_random.pth"
        torch.save(sd, path)

        model, variables = vgg19_params(weights_path=str(path))

        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 64, 48, 3)).astype(np.float32)

        captured = model.apply(variables, jnp.asarray(x))

        features.eval()
        with torch.no_grad():
            tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW
            torch_feats = {}
            h = tx
            for i, m in enumerate(features):
                h = m(h)
                torch_feats[i] = h.numpy()

        for layer in sorted(set(PERCEPTUAL_LAYERS + STYLE_LAYERS)):
            ours = np.transpose(np.asarray(captured[layer]), (0, 3, 1, 2))
            theirs = torch_feats[layer]
            assert ours.shape == theirs.shape
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_missing_weights_fall_back_to_he_init(self, monkeypatch):
        """Without MAI_VGG19_WEIGHTS the documented random-feature fallback
        engages (deterministic across calls)."""
        import jax.numpy as jnp

        from ml_audio_inpainting_tpu.models.vgg import vgg19_params

        monkeypatch.delenv("MAI_VGG19_WEIGHTS", raising=False)
        _, v1 = vgg19_params()
        _, v2 = vgg19_params()
        k1 = v1["params"]["conv0"]["kernel"]
        k2 = v2["params"]["conv0"]["kernel"]
        assert jnp.array_equal(k1, k2)
