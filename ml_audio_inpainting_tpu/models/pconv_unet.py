"""Partial-convolution U-Net generator (NVIDIA PConv inpainting) in flax.

TPU-first re-design of the reference's ``PConvUNet``
(``models/GAN/networks.py:10-345``):

* NHWC layout throughout (XLA's native TPU conv layout).
* The mask state is kept **single-channel**.  The reference materializes the
  mask at full channel width and convolves it with an all-ones
  ``C_in -> 1`` kernel (``networks.py:43-47,85``); algebraically that equals
  a 1-channel ones-conv of the *channel-summed* mask.  At concat points the
  channel sum is ``C_a * mask_a + C_b * mask_b`` -- so we carry one channel
  plus the channel multiplicities, reproducing the reference's
  renormalization bit-for-bit while doing ~C_in x less mask compute and HBM
  traffic.
* Mask renormalization: ``out = conv(x * mask) * window_size /
  (mask_conv + 1e-8)`` with the updated mask clamped to [0, 1]
  (``networks.py:87-99``).
* Whole-input handling matches ``networks.py:247-345``: reflect-pad features
  / ones-pad mask to a multiple of the total downsampling (128), 7 stride-2
  encoder stages, 6 decoder stages with nearest 2x upsampling and
  feature+mask skip concats, a final PConv -> act -> PConv pair whose skip is
  the *network input*, Tanh, crop.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PartialConv", "PConvUNet"]


def _ones_conv(mask_sum: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """Convolve a single-channel mask channel-sum with an all-ones kernel."""
    k = jnp.ones((kernel, kernel, 1, 1), mask_sum.dtype)
    return jax.lax.conv_general_dilated(
        mask_sum,
        k,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class PartialConv(nn.Module):
    """Partial convolution: masked conv + receptive-field renormalization.

    Args mirror the reference's ``PartialConv2d`` (``networks.py:10-106``).
    ``mask_channel_sum`` is the per-pixel sum of the (possibly per-channel)
    input mask over channels; for a uniform mask that is ``C_in * mask``.
    Returns ``(features, updated_mask)`` with the mask single-channel in
    [0, 1].
    """

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = True
    # When True, ``x`` is already multiplied by its (per-group) mask and
    # ``mask`` is ignored -- avoids materializing full-channel-width mask
    # tensors at concat points (a multi-GB HBM saving at batch scale).
    premasked: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray], mask_channel_sum: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pad = self.kernel // 2
        c_in = x.shape[-1]
        out = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            name="conv",
        )(x if self.premasked else x * mask)

        updated = _ones_conv(mask_channel_sum, self.kernel, self.stride, pad)
        window_size = float(c_in * self.kernel * self.kernel)
        ratio = window_size / (updated + 1e-8)
        out = out * ratio
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        new_mask = jnp.clip(updated, 0.0, 1.0)
        return out, new_mask


class _EncDecBlock(nn.Module):
    """PConv -> BatchNorm -> LeakyReLU(0.2) (``networks.py:139-168``)."""

    features: int
    kernel: int
    stride: int
    premasked: bool = False

    @nn.compact
    def __call__(self, x, mask, mask_channel_sum, train: bool):
        x, mask = PartialConv(
            self.features,
            self.kernel,
            self.stride,
            use_bias=False,
            premasked=self.premasked,
            name="pconv",
        )(x, mask, mask_channel_sum)
        x = nn.BatchNorm(use_running_average=not train, name="norm")(x)
        x = nn.leaky_relu(x, 0.2)
        return x, mask


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling (``nn.Upsample(mode='nearest')``)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _resize_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    if x.shape[1] == h and x.shape[2] == w:
        return x
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="nearest")


class PConvUNet(nn.Module):
    """The generator.  Input ``(B, F, T)`` magnitude + ``(B, F, T)`` mask
    (1 = valid / 0 = hole); output ``(B, F, T)`` in [-1, 1] (Tanh).

    Stage configs default to the reference's (``networks.py:179-188``).
    """

    enc_layer_cfg: Sequence[Tuple[int, int, int]] = (
        (64, 7, 2),
        (128, 5, 2),
        (256, 5, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
    )
    dec_layer_cfg: Sequence[Tuple[int, int, int]] = (
        (512, 3, 1),
        (512, 3, 1),
        (512, 3, 1),
        (256, 3, 1),
        (128, 3, 1),
        (64, 3, 1),
    )
    final_interim_ch: int = 64
    final_kernel: int = 3
    output_channels: int = 1

    @property
    def total_downsampling(self) -> int:
        f = 1
        for _, _, s in self.enc_layer_cfg:
            f *= s
        return f

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        if mask.ndim == 3:
            mask = mask[..., None]
        B, H_in, W_in, _ = x.shape

        # --- Pad to a multiple of the total downsampling (networks.py:254-261)
        factor = self.total_downsampling
        pad_h = (-H_in) % factor
        pad_w = (-W_in) % factor
        x_pad = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        mask_pad = jnp.pad(
            mask, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), constant_values=1.0
        )

        # --- Encoder: first input is concat(x, mask) -> 2 channels
        feat = jnp.concatenate([x_pad, mask_pad], axis=-1)
        m = mask_pad  # single-channel mask state
        enc_feats, enc_masks = [], []
        for i, (ch, k, s) in enumerate(self.enc_layer_cfg):
            c_in = feat.shape[-1]
            feat, m = _EncDecBlock(ch, k, s, name=f"enc{i}")(
                feat, m, c_in * m, train
            )
            enc_feats.append(feat)
            enc_masks.append(m)

        # --- Decoder with skip concats of features AND masks
        dec_feat = enc_feats[-1]
        dec_mask = enc_masks[-1]
        for i, (ch, k, s) in enumerate(self.dec_layer_cfg):
            dec_feat = _upsample2x(dec_feat)
            dec_mask = _upsample2x(dec_mask)
            skip_feat = enc_feats[len(enc_feats) - 2 - i]
            skip_mask = enc_masks[len(enc_masks) - 2 - i]
            dec_feat = _resize_nearest(dec_feat, skip_feat.shape[1], skip_feat.shape[2])
            dec_mask = _resize_nearest(dec_mask, skip_feat.shape[1], skip_feat.shape[2])

            c_dec = dec_feat.shape[-1]
            c_skip = skip_feat.shape[-1]
            # Per-channel masks differ across the concat -> pre-mask each
            # group with its single-channel mask instead of materializing a
            # full-width mask tensor (networks.py:296-298 concatenates the
            # broadcast masks; the renormalization only needs their channel
            # sum, so this is exact and saves multi-GB of HBM at batch scale).
            feat_cat = jnp.concatenate(
                [dec_feat * dec_mask, skip_feat * skip_mask], axis=-1
            )
            mask_sum = c_dec * dec_mask + c_skip * skip_mask
            dec_feat, dec_mask = _EncDecBlock(
                ch, k, s, premasked=True, name=f"dec{i}"
            )(feat_cat, None, mask_sum, train)

        # --- Final: upsample, skip with the *network input* (networks.py:304-328)
        dec_feat = _upsample2x(dec_feat)
        dec_mask = _upsample2x(dec_mask)
        c_dec = dec_feat.shape[-1]
        feat_cat = jnp.concatenate([dec_feat * dec_mask, x_pad * mask_pad], axis=-1)
        mask_sum = c_dec * dec_mask + 1.0 * mask_pad
        out, m1 = PartialConv(
            self.final_interim_ch,
            self.final_kernel,
            1,
            use_bias=True,
            premasked=True,
            name="final_pconv1",
        )(feat_cat, None, mask_sum)
        out = nn.leaky_relu(out, 0.2)
        out, _ = PartialConv(
            self.output_channels, self.final_kernel, 1, use_bias=True, name="final_pconv2"
        )(out, m1, self.final_interim_ch * m1)
        out = jnp.tanh(out)

        # --- Crop (networks.py:333-343)
        out = out[:, :H_in, :W_in, :]
        return out[..., 0] if self.output_channels == 1 else out
