"""Port reference PyTorch checkpoints into this framework's flax models.

The reference ships trained torch ``state_dict`` files (e.g.
``models/CNNBLSTM/checkpoints/OLD/blstm_cnn_no_gap_2025_04_05_BEST.pt``);
this module converts them layer-for-layer so reference-trained weights run
natively on TPU.  Layout conversions:

* Conv2d ``(O, I, kh, kw)``  -> flax ``(kh, kw, I, O)`` (NCHW/NHWC share the
  same spatial order here: H = frequency, W = time).
* BatchNorm weight/bias -> scale/bias params; running mean/var ->
  ``batch_stats``.
* LSTM ``weight_ih_l{k}[_reverse]`` ``(4H, in)`` -> ``w_ih (in, 4H)``;
  ``weight_hh`` ``(4H, H)`` -> ``w_hh (H, 4H)``; the two torch biases sum
  into this framework's single bias (identical math).  Gate order (i, f, g,
  o) matches by construction (``ops/lstm.py``).
* Linear ``(out, in)`` -> Dense kernel ``(in, out)``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.models.cnn_blstm import StackedBLSTMCNN
from ml_audio_inpainting_tpu.models.pconv_unet import PConvUNet

__all__ = ["load_torch_cnn_blstm", "load_torch_pconv_unet"]


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    b = np.asarray(sd[f"{name}.bias"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}


def _bn(sd, name):
    params = {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }
    stats = {
        "mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"])),
        "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"])),
    }
    return params, stats


def _dense(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    b = np.asarray(sd[f"{name}.bias"])
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def _lstm(sd, num_layers: int):
    out = {}
    for layer in range(num_layers):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            wi = np.asarray(sd[f"lstm.weight_ih_l{layer}{suffix}"])  # (4H, in)
            wh = np.asarray(sd[f"lstm.weight_hh_l{layer}{suffix}"])  # (4H, H)
            bi = np.asarray(sd[f"lstm.bias_ih_l{layer}{suffix}"])
            bh = np.asarray(sd[f"lstm.bias_hh_l{layer}{suffix}"])
            out[f"l{layer}_{direction}_w_ih"] = jnp.asarray(wi.T)
            out[f"l{layer}_{direction}_w_hh"] = jnp.asarray(wh.T)
            out[f"l{layer}_{direction}_b"] = jnp.asarray(bi + bh)
    return out


def load_torch_pconv_unet(
    state_dict,
    enc_layer_cfg=((64, 7, 2), (128, 5, 2), (256, 5, 2),
                   (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2)),
    dec_layer_cfg=((512, 3, 1), (512, 3, 1), (512, 3, 1),
                   (256, 3, 1), (128, 3, 1), (64, 3, 1)),
    final_interim_ch: int = 64,
) -> Tuple[PConvUNet, Dict]:
    """Port a reference ``PConvUNet`` generator ``state_dict``
    (``models/GAN/networks.py:173-345``) into this framework's model.

    The frozen all-ones mask-conv weights are architecture constants here
    and are skipped; encoder/decoder PConvs use bias=False + BatchNorm, the
    two final PConvs carry explicit bias parameters.
    """
    sd = state_dict
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}

    model = PConvUNet(
        enc_layer_cfg=tuple(tuple(l) for l in enc_layer_cfg),
        dec_layer_cfg=tuple(tuple(l) for l in dec_layer_cfg),
        final_interim_ch=final_interim_ch,
    )

    params: Dict = {}
    batch_stats: Dict = {}

    def block(flax_name, torch_prefix):
        w = sd[f"{torch_prefix}.pconv.conv.weight"]
        params[flax_name] = {
            "pconv": {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}},
            "norm": {
                "scale": jnp.asarray(sd[f"{torch_prefix}.norm.weight"]),
                "bias": jnp.asarray(sd[f"{torch_prefix}.norm.bias"]),
            },
        }
        batch_stats[flax_name] = {
            "norm": {
                "mean": jnp.asarray(sd[f"{torch_prefix}.norm.running_mean"]),
                "var": jnp.asarray(sd[f"{torch_prefix}.norm.running_var"]),
            }
        }

    for i in range(len(enc_layer_cfg)):
        block(f"enc{i}", f"encoder_blocks.{i}")
    for i in range(len(dec_layer_cfg)):
        block(f"dec{i}", f"decoder_blocks.{i}")

    for flax_name, idx in (("final_pconv1", 0), ("final_pconv2", 2)):
        w = sd[f"final_decoder_layer.{idx}.conv.weight"]
        params[flax_name] = {
            "conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
            "bias": jnp.asarray(sd[f"final_decoder_layer.{idx}.bias"]),
        }

    return model, {"params": params, "batch_stats": batch_stats}


def load_torch_cnn_blstm(
    path: str, freq_bins: int = 257, use_pallas_lstm: Optional[bool] = None
) -> Tuple[StackedBLSTMCNN, Dict]:
    """Load a reference CNNBLSTM ``state_dict`` -> ``(model, variables)``.

    Architecture hyperparameters (hidden dim, layer count, global-pool
    lineage) are inferred from the tensor shapes, so both the current
    reference architecture (``model.py:16-107``) and the v2 global-pool
    lineage load transparently.  ``use_pallas_lstm=None`` auto-selects: the
    Pallas recurrence on TPU, XLA scan elsewhere (matching
    ``cnn_trainer.build_model``).
    """
    import torch

    if use_pallas_lstm is None:
        use_pallas_lstm = jax.default_backend() == "tpu"

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}

    n_layers = 1 + max(
        int(k.split("_l")[1].split("_")[0].rstrip("everse"))
        for k in sd
        if k.startswith("lstm.weight_ih_l")
    )
    four_h, lstm_in = sd["lstm.weight_ih_l0"].shape
    hidden = four_h // 4
    enc_out = sd["encoder.6.weight"].shape[0]
    in_channels = sd["encoder.0.weight"].shape[1]
    dec0_out = sd["decoder.0.weight"].shape[0]
    dec0_in = sd["decoder.0.weight"].shape[1]
    global_pool = lstm_in == enc_out  # pooled: LSTM sees channels only

    model = StackedBLSTMCNN(
        in_channels=in_channels,
        num_lstm_layers=n_layers,
        lstm_hidden_dim=hidden,
        freq_bins=freq_bins,
        enc_filters=(
            sd["encoder.0.weight"].shape[0],
            sd["encoder.3.weight"].shape[0],
        ),
        dec_filters=(dec0_in, dec0_out),
        use_pallas_lstm=use_pallas_lstm,
        global_pool=global_pool,
    )
    if enc_out != hidden // 2:
        raise ValueError(
            f"checkpoint encoder output {enc_out} != hidden/2 = {hidden // 2}"
        )

    params = {
        "enc_conv0": _conv(sd, "encoder.0"),
        "enc_conv1": _conv(sd, "encoder.3"),
        "enc_conv2": _conv(sd, "encoder.6"),
        "projection": _dense(sd, "projection"),
        "dec_conv0": _conv(sd, "decoder.0"),
        "dec_conv1": _conv(sd, "decoder.3"),
        "dec_conv2": _conv(sd, "decoder.6"),
        "lstm": _lstm(sd, n_layers),
    }
    batch_stats = {}
    for flax_name, torch_name in (
        ("enc_bn0", "encoder.1"),
        ("enc_bn1", "encoder.4"),
        ("enc_bn2", "encoder.7"),
        ("dec_bn0", "decoder.1"),
        ("dec_bn1", "decoder.4"),
    ):
        p, s = _bn(sd, torch_name)
        params[flax_name] = p
        batch_stats[flax_name] = s

    return model, {"params": params, "batch_stats": batch_stats}
