"""CNN encoder -> BiLSTM bottleneck -> CNN decoder inpainting model.

TPU-native re-design of the reference's ``StackedBLSTMCNN``
(``models/CNNBLSTM/model.py:16-107``):

* convs run in NHWC layout ``(B, F, T, C)`` -- XLA's preferred TPU layout --
  instead of torch's NCHW;
* the BiLSTM bottleneck is the scan-based :class:`~...ops.lstm.BiLSTM` with
  hoisted MXU projections;
* ``reconstruct_spectrogram`` composites prediction into the gap only,
  matching ``model.py:92-107`` (mask convention here: **1 = gap**, the
  CNNBLSTM convention, SURVEY.md §2.7).

Architecture contract (cnn_blstm.yaml:23-29): encoder convs
in->16->32->hidden/2 (3x3, BN, ReLU); BiLSTM input ``freq_bins * hidden/2`` =
257*64 = 16448, hidden 128, 3 layers; Linear(256 -> 257*dec_filters[0]);
decoder convs 16->32->16->in_channels.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ml_audio_inpainting_tpu.ops.lstm import BiLSTM

__all__ = ["StackedBLSTMCNN"]


class StackedBLSTMCNN(nn.Module):
    in_channels: int = 1
    num_lstm_layers: int = 3
    lstm_hidden_dim: int = 128
    freq_bins: int = 257
    enc_filters: Sequence[int] = (16, 32)
    dec_filters: Sequence[int] = (16, 32)
    # Run the recurrence as single Pallas kernels (weights/carry resident in
    # VMEM; measured ~parity with XLA scan on forward and ~12% faster on the
    # backward at production shapes -- see ops/pallas/lstm_cell.py).
    use_pallas_lstm: bool = False
    # v2-era lineage variant (checkpoints/OLD/README.txt): mean-pool the
    # frequency axis before the BiLSTM so the recurrence sees only the
    # channel features (the shipped ``blstm_cnn_no_gap_2025_04_05_BEST.pt``
    # checkpoint uses this shape -- LSTM input = enc channels).
    global_pool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Forward over ``(B, F, T)`` (or ``(B, F, T, C)``) log spectrograms.

        Returns ``(B, F, T)`` for 1 input channel, else ``(B, F, T, C)``.
        """
        squeeze = False
        if x.ndim == 3:
            x = x[..., None]  # (B, F, T, 1)
            squeeze = True
        B, F, T, _ = x.shape

        # --- Conv encoder (model.py:34-44) ---
        enc_channels = list(self.enc_filters) + [self.lstm_hidden_dim // 2]
        h = x
        for i, ch in enumerate(enc_channels):
            h = nn.Conv(ch, (3, 3), padding="SAME", name=f"enc_conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"enc_bn{i}")(h)
            h = nn.relu(h)

        # --- Reshape to sequence (model.py:73-74): (B, T, C*F) -- or the
        # global-pool variant: mean over F -> (B, T, C) ---
        if self.global_pool:
            seq = h.mean(axis=1).reshape(B, T, -1)
        else:
            seq = h.transpose(0, 2, 3, 1).reshape(B, T, -1)

        # --- BiLSTM bottleneck (model.py:46-47) ---
        seq = BiLSTM(
            self.lstm_hidden_dim,
            self.num_lstm_layers,
            use_pallas=self.use_pallas_lstm,
            name="lstm",
        )(seq)

        # --- Projection back to 2D (model.py:50, 80-83) ---
        seq = nn.Dense(self.freq_bins * self.dec_filters[0], name="projection")(seq)
        h = seq.reshape(B, T, self.dec_filters[0], F).transpose(0, 3, 1, 2)  # (B, F, T, C)

        # --- Conv decoder (model.py:53-61) ---
        h = nn.Conv(self.dec_filters[1], (3, 3), padding="SAME", name="dec_conv0")(h)
        h = nn.BatchNorm(use_running_average=not train, name="dec_bn0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dec_filters[0], (3, 3), padding="SAME", name="dec_conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="dec_bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.in_channels, (3, 3), padding="SAME", name="dec_conv2")(h)

        return h[..., 0] if squeeze else h

    def reconstruct_spectrogram(
        self, variables, log_spectrogram_gap: jnp.ndarray, gap_mask: jnp.ndarray
    ) -> jnp.ndarray:
        """Predict the full spectrogram, keep it only inside the gap.

        ``gap_mask`` uses the CNNBLSTM convention (1 = gap) -- reference
        ``model.py:92-107``.  In phase mode (``in_channels == 2``) the input
        is stacked (real, imag) channels of the raw complex STFT; channels
        are recombined to complex before compositing (``model.py:102-104``)
        and the return value is complex.
        """
        pred = self.apply(variables, log_spectrogram_gap, train=False)
        if self.in_channels == 2:
            pred_c = pred[..., 0] + 1j * pred[..., 1]
            in_c = log_spectrogram_gap[..., 0] + 1j * log_spectrogram_gap[..., 1]
            return pred_c * gap_mask + in_c * (1.0 - gap_mask)
        return pred * gap_mask + log_spectrogram_gap * (1.0 - gap_mask)
