"""Legacy BLSTM model variants (reference ``models/CNNBLSTM/old/models_OLD.py``).

The reference keeps its earlier model iterations in-tree; users of the
framework get the same family here, rebuilt on the scan-based BiLSTM:

* :class:`StackedBLSTM`        -- pure BiLSTM + linear head over full
  spectrogram columns (``models_OLD.py:16-60``).
* :class:`StackedBLSTMGapOnly` -- predicts only the gap frames through an
  FC 512 -> 128 -> gap_dim head (``models_OLD.py:87-127``).
* :class:`StackedNormBLSTM`    -- per-layer LayerNorm between BiLSTM layers
  (``models_OLD.py:130-214``).

All take ``(B, T, F)`` sequences of spectrogram columns (the legacy
dataloader feeds time-major features) and support the dropout the originals
apply after the recurrence.
"""

from __future__ import annotations

import math
import jax.numpy as jnp
from flax import linen as nn

from ml_audio_inpainting_tpu.ops.lstm import BiLSTM

__all__ = ["StackedBLSTM", "StackedBLSTMGapOnly", "StackedNormBLSTM"]


class StackedBLSTM(nn.Module):
    audio_feat_dim: int = 257
    hidden_dim: int = 128
    num_layers: int = 3
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = BiLSTM(self.hidden_dim, self.num_layers, name="blstm")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.audio_feat_dim, name="fc")(x)

    def reconstruct_spectrogram(self, variables, log_spec_gap_tf, gap_mask_tf):
        """Composite prediction into the gap (mask 1 = gap), time-major."""
        pred = self.apply(variables, log_spec_gap_tf, train=False)
        return pred * gap_mask_tf + log_spec_gap_tf * (1.0 - gap_mask_tf)


class StackedBLSTMGapOnly(nn.Module):
    """Predicts only the gap columns: output ``(B, T, gap_feat_dim)`` where
    ``gap_feat_dim = ceil(audio_feat_dim * gap_len_s / max_len_s)``
    (``models_OLD.py:92``)."""

    audio_feat_dim: int = 417
    gap_fraction: float = 0.2 / 5.0
    hidden_dim: int = 128
    num_layers: int = 3
    dropout_rate: float = 0.0

    @property
    def gap_feat_dim(self) -> int:
        return math.ceil(self.audio_feat_dim * self.gap_fraction)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = BiLSTM(self.hidden_dim, self.num_layers, name="blstm")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = nn.relu(nn.Dense(128, name="fc2")(x))
        return nn.Dense(self.gap_feat_dim, name="fc3")(x)


class StackedNormBLSTM(nn.Module):
    """BiLSTM stack with LayerNorm after each bidirectional layer."""

    audio_feat_dim: int = 257
    hidden_dim: int = 128
    num_layers: int = 3
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = BiLSTM(self.hidden_dim, 1, name=f"blstm{i}")(x)
            x = nn.LayerNorm(name=f"norm{i}")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.audio_feat_dim, name="fc")(x)
