"""Torch checkpoint porting: the reference's shipped trained CNNBLSTM must
produce (near-)identical outputs through this framework."""

import os

import numpy as np
import pytest

CKPT = "/root/reference/models/CNNBLSTM/checkpoints/OLD/blstm_cnn_no_gap_2025_04_05_BEST.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT), reason="reference checkpoint not mounted")


def _torch_reference_model():
    import torch
    import torch.nn as nn

    class TorchModel(nn.Module):
        def __init__(self, hidden=64, freq=257):
            super().__init__()
            self.encoder = nn.Sequential(
                nn.Conv2d(1, 16, 3, padding=1), nn.BatchNorm2d(16), nn.ReLU(),
                nn.Conv2d(16, 32, 3, padding=1), nn.BatchNorm2d(32), nn.ReLU(),
                nn.Conv2d(32, hidden // 2, 3, padding=1), nn.BatchNorm2d(hidden // 2), nn.ReLU(),
            )
            self.pool = nn.AdaptiveAvgPool2d((1, None))
            self.lstm = nn.LSTM(hidden // 2, hidden, num_layers=3, batch_first=True, bidirectional=True)
            self.projection = nn.Linear(hidden * 2, freq * 16)
            self.decoder = nn.Sequential(
                nn.Conv2d(16, 32, 3, padding=1), nn.BatchNorm2d(32), nn.ReLU(),
                nn.Conv2d(32, 16, 3, padding=1), nn.BatchNorm2d(16), nn.ReLU(),
                nn.Conv2d(16, 1, 3, padding=1),
            )

        def forward(self, x):
            B, _, F, T = x.shape
            h = self.encoder(x)
            h = self.pool(h).squeeze(2).permute(0, 2, 1)
            h, _ = self.lstm(h)
            h = self.projection(h)
            h = h.view(B, T, 16, F).permute(0, 2, 3, 1)
            return self.decoder(h).squeeze(1)

    return TorchModel()


class TestTorchPort:
    def test_shipped_checkpoint_matches_torch(self):
        import jax.numpy as jnp
        import torch

        from ml_audio_inpainting_tpu.models.port_torch import load_torch_cnn_blstm

        tm = _torch_reference_model()
        sd = torch.load(CKPT, map_location="cpu", weights_only=True)
        missing, unexpected = tm.load_state_dict(sd, strict=False)
        assert not missing and not unexpected
        tm.eval()

        model, variables = load_torch_cnn_blstm(CKPT)
        assert model.global_pool and model.lstm_hidden_dim == 64
        assert model.num_lstm_layers == 3

        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, 257, 417)) * 0.5 - 4.0).astype(np.float32)
        with torch.no_grad():
            y_t = tm(torch.from_numpy(x).unsqueeze(1)).numpy()
        y_j = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(y_j, y_t, atol=2e-5)

    def test_reconstruct_with_ported_weights(self):
        import jax.numpy as jnp

        from ml_audio_inpainting_tpu.models.port_torch import load_torch_cnn_blstm

        model, variables = load_torch_cnn_blstm(CKPT)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 257, 417)).astype(np.float32))
        gm = jnp.zeros((1, 257, 417)).at[:, :, 100:110].set(1.0)
        out = np.asarray(model.reconstruct_spectrogram(variables, x, gm))
        np.testing.assert_array_equal(out[:, :, :100], np.asarray(x)[:, :, :100])
        assert np.all(np.isfinite(out))


GAN_REF_DIR = "/root/reference/models/GAN"


@pytest.mark.skipif(
    not os.path.isdir(GAN_REF_DIR), reason="reference GAN sources not mounted"
)
class TestPConvUNetParity:
    def test_generator_matches_reference_implementation(self):
        """Definitive parity: random-initialize the REFERENCE torch PConvUNet
        (imported from the mounted reference sources), port its weights, and
        compare full forwards -- must agree to f32 epsilon.  Covers the
        partial-conv renormalization, mask plumbing through skips, padding
        and cropping, and the final input-skip PConv pair."""
        import sys

        import jax.numpy as jnp
        import torch

        sys.path.insert(0, GAN_REF_DIR)
        try:
            import networks as ref_networks
        finally:
            sys.path.remove(GAN_REF_DIR)

        from ml_audio_inpainting_tpu.models.port_torch import load_torch_pconv_unet

        torch.manual_seed(0)
        tnet = ref_networks.PConvUNet()
        tnet.eval()
        model, variables = load_torch_pconv_unet(tnet.state_dict())

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 257, 626)).astype(np.float32)
        mask = np.ones((1, 257, 626), np.float32)
        mask[:, :, 300:320] = 0.0
        with torch.no_grad():
            y_t = tnet(
                torch.from_numpy(x).unsqueeze(1), torch.from_numpy(mask).unsqueeze(1)
            ).squeeze(1).numpy()
        y_j = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(mask), train=False))
        np.testing.assert_allclose(y_j, y_t, atol=5e-6)
