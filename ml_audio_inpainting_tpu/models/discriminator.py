"""Spectral-norm PatchGAN discriminator in flax.

Reference: ``models/GAN/networks.py:352-410`` -- 4 spectral-normalized conv
blocks (64/128/256 stride 2, 512 stride 1, kernel 4, LeakyReLU 0.2, no norm
layers) plus a final 1-channel spectral-normalized conv.  Spectral norm's
power-iteration vectors live in the ``batch_stats`` collection and are
updated functionally inside the jitted train step (SURVEY.md §7 "Spectral
norm under jit") -- the torch version relies on a stateful forward hook.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Discriminator"]


class Discriminator(nn.Module):
    layer_cfg: Sequence[Tuple[int, int]] = ((64, 2), (128, 2), (256, 2), (512, 1))
    kernel_size: int = 4
    use_spectral_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """``(B, F, T)`` or ``(B, F, T, C)`` -> patch logits ``(B, F', T', 1)``."""
        if x.ndim == 3:
            x = x[..., None]
        k = self.kernel_size
        pad = [(1, 1), (1, 1)]
        for i, (ch, stride) in enumerate(self.layer_cfg):
            conv = nn.Conv(
                ch, (k, k), strides=(stride, stride), padding=pad, use_bias=True,
                name=f"block{i}_conv",
            )
            if self.use_spectral_norm:
                conv = nn.SpectralNorm(conv, collection_name="batch_stats")
            x = conv(x, update_stats=train) if self.use_spectral_norm else conv(x)
            x = nn.leaky_relu(x, 0.2)
        final = nn.Conv(1, (k, k), strides=(1, 1), padding=pad, use_bias=True, name="final_conv")
        if self.use_spectral_norm:
            final = nn.SpectralNorm(final, collection_name="batch_stats")
            x = final(x, update_stats=train)
        else:
            x = final(x)
        return x
