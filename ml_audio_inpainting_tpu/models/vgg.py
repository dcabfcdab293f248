"""VGG19 perceptual/style feature extractor in JAX.

Reference: ``models/GAN/loss.py`` -- frozen torchvision VGG19 ``features``
stack; perceptual L1 on conv outputs {2, 7, 12, 21, 30}, style L1 on Gram
matrices of conv outputs {0, 5, 10, 19, 28}, with torchvision's
ImageClassification preprocessing (resize shorter side to 256 bilinear
antialias, center-crop 224, ImageNet mean/std normalization).

Weights: the environment has no network and no torchvision, so pretrained
VGG19 weights cannot be downloaded.  Two paths:

* :func:`load_torch_vgg19` converts a torch ``state_dict`` file (e.g. the
  torchvision ``vgg19-dcbb9e9d.pth``) into this module's params when one is
  available -- set ``MAI_VGG19_WEIGHTS=/path/to.pth``.
* otherwise :func:`vgg19_params` returns deterministic He-initialized
  weights (fixed seed).  Random-feature perceptual losses are a documented
  substitution (they still impose multi-scale structure); swap in real
  weights for exact reference parity.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "VGG19Features",
    "vgg19_params",
    "load_torch_vgg19",
    "preprocess_for_vgg",
    "vgg_perceptual_style_losses",
    "PERCEPTUAL_LAYERS",
    "STYLE_LAYERS",
]

# torchvision vgg19.features layout: layer index -> conv (in, out).
VGG19_CONV_LAYERS: Dict[int, Tuple[int, int]] = {
    0: (3, 64), 2: (64, 64),
    5: (64, 128), 7: (128, 128),
    10: (128, 256), 12: (256, 256), 14: (256, 256), 16: (256, 256),
    19: (256, 512), 21: (512, 512), 23: (512, 512), 25: (512, 512),
    28: (512, 512), 30: (512, 512), 32: (512, 512), 34: (512, 512),
}
VGG19_POOL_LAYERS = (4, 9, 18, 27, 36)

PERCEPTUAL_LAYERS = (2, 7, 12, 21, 30)  # loss.py:17
STYLE_LAYERS = (0, 5, 10, 19, 28)  # loss.py:16

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """Runs the VGG19 conv stack, returning features at ``capture_layers``.

    Input NHWC ``(B, H, W, 3)``, already preprocessed.  Stops after the
    deepest captured layer (the reference's early exit, ``loss.py:49-50``).
    """

    capture_layers: Sequence[int] = tuple(sorted(set(PERCEPTUAL_LAYERS + STYLE_LAYERS)))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        captured: Dict[int, jnp.ndarray] = {}
        max_layer = max(self.capture_layers)
        for idx in range(max_layer + 1):
            if idx in VGG19_CONV_LAYERS:
                _, out_c = VGG19_CONV_LAYERS[idx]
                x = nn.Conv(out_c, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv{idx}")(x)
            elif idx in VGG19_POOL_LAYERS:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(x)  # odd indices are ReLU
            if idx in self.capture_layers:
                captured[idx] = x
        return captured


def vgg19_params(
    capture_layers: Sequence[int] = tuple(sorted(set(PERCEPTUAL_LAYERS + STYLE_LAYERS))),
    weights_path: Optional[str] = None,
    seed: int = 42,
):
    """Build VGG19 params: converted torch weights if available, else
    deterministic He init.  Checks ``MAI_VGG19_WEIGHTS`` by default."""
    model = VGG19Features(capture_layers=tuple(capture_layers))
    dummy = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(seed), dummy)
    path = weights_path or os.environ.get("MAI_VGG19_WEIGHTS")
    if path and os.path.exists(path):
        variables = {"params": load_torch_vgg19(path, variables["params"])}
    return model, variables


def load_torch_vgg19(path: str, template_params) -> Dict:
    """Convert a torchvision VGG19 ``state_dict`` (``features.N.weight`` /
    ``.bias``) into this module's params.  torch conv weights are OIHW;
    flax expects HWIO."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = jax.tree_util.tree_map(lambda x: x, template_params)  # shallow copy
    params = dict(params)
    for idx in VGG19_CONV_LAYERS:
        name = f"conv{idx}"
        if name not in params:
            continue
        w = sd[f"features.{idx}.weight"].numpy()  # (O, I, H, W)
        b = sd[f"features.{idx}.bias"].numpy()
        params[name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return params


def _resize_shorter_side(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """Bilinear antialiased resize of NHWC so the shorter spatial side is
    ``target`` (torchvision ``Resize(256)`` semantics)."""
    _, h, w, _ = x.shape
    if h <= w:
        new_h, new_w = target, max(1, int(round(w * target / h)))
    else:
        new_h, new_w = max(1, int(round(h * target / w))), target
    return jax.image.resize(
        x, (x.shape[0], new_h, new_w, x.shape[3]), method="bilinear", antialias=True
    )


def _center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    _, h, w, _ = x.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return x[:, top : top + size, left : left + size, :]


def preprocess_for_vgg(
    x: jnp.ndarray, is_generated: bool, resize: int = 256, crop: int = 224
) -> jnp.ndarray:
    """Reference input prep + torchvision normalization (``loss.py:65-106``).

    ``x``: ``(B, F, T)`` spectrogram.  Generated inputs (Tanh output) map
    [-1, 1] -> [0, 1]; targets are clamped at 0 and max-normalized.  Then
    1 -> 3 channel repeat, resize/crop, ImageNet mean/std.
    """
    if x.ndim == 3:
        x = x[..., None]  # NHWC
    if is_generated:
        x = (x + 1.0) / 2.0
    else:
        x = jnp.maximum(x, 0.0)
        max_val = jnp.max(x) + 1e-6
        x = jnp.where(max_val > 1e-5, x / max_val, x)
    x = jnp.clip(x, 0.0, 1.0)
    x = jnp.repeat(x, 3, axis=-1)
    x = _resize_shorter_side(x, resize)
    x = _center_crop(x, crop)
    # Follow the input dtype: f32 constants would silently promote a
    # reduced-precision (mixed-precision training) input back to f32 and
    # with it the whole downstream conv stack.
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std


def _gram(feats: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix over NHWC features, normalized by C*H*W (``loss.py:53-62``)."""
    B, H, W, C = feats.shape
    f = feats.reshape(B, H * W, C)
    gram = jnp.einsum("bnc,bnd->bcd", f, f)
    return gram / (C * H * W)


def vgg_perceptual_style_losses(
    model: VGG19Features,
    variables,
    generated: jnp.ndarray,
    target: jnp.ndarray,
    perceptual_layers: Sequence[int] = PERCEPTUAL_LAYERS,
    style_layers: Sequence[int] = STYLE_LAYERS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(perceptual, style) losses, averaged over layers (``loss.py:89-132``)."""
    gen = model.apply(variables, preprocess_for_vgg(generated, is_generated=True))
    tgt = model.apply(variables, preprocess_for_vgg(target, is_generated=False))

    # The conv stack may run in reduced precision (mixed-precision training
    # casts the variables/inputs to bf16); the loss reductions sum over
    # ~1e6 elements, so accumulate them in f32 regardless of feature dtype.
    f32 = lambda a: a.astype(jnp.float32)  # noqa: E731
    perceptual = jnp.mean(
        jnp.stack(
            [jnp.mean(jnp.abs(f32(gen[i]) - f32(tgt[i]))) for i in perceptual_layers]
        )
    )
    style = jnp.mean(
        jnp.stack(
            [
                jnp.mean(jnp.abs(_gram(f32(gen[i])) - _gram(f32(tgt[i]))))
                for i in style_layers
            ]
        )
    )
    return perceptual, style
