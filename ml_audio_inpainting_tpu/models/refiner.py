"""Learned time-domain gap refinement head (VERDICT r2 #1).

Why: without the phase oracle, spectrogram models collapse to ~+0.1 dB
gap-SDR while time-domain AR extrapolation keeps +2.55 (results/README.md
phase-regime table).  Round-3 measurements closed off the other proposed
routes: magnitude-projection (consistent Griffin-Lim) LOSES the AR fill's
alignment (+2.55 -> -0.6), gradient descent on magnitude fit degrades
monotonically with the neural magnitude (and the oracle-magnitude control
shows the optimizer itself is fine: +2.2), and linear solver fusion is
bounded by 0.78-0.93 error correlations between methods.  What remains is
exactly what the waveform needs: a NONLINEAR, position-aware correction in
the time domain, trained to maximize gap-SDR itself.

``WaveRefiner`` is a small dilated 1-D conv network over a window centered
on the gap.  Inputs (channels): the impaired waveform (gap zeroed), the AR
extrapolation fill (``classical/arinpaint``), the neural reconstruction
under extrapolated phase (``runtime/inference`` deployable path), and the
gap-position indicator.  The output is a DELTA added to the AR fill, with
the final projection zero-initialized: at initialization the head
reproduces the AR solution exactly, so training starts from the
deployable-SDR state of the art and can only move up the objective.  The
composite keeps observed samples untouched.

TPU notes: all convs are static-shape NCW->NWC ``lax.conv_general_dilated``
via flax, the whole head is one fused XLA program appended to the existing
deployable inference graph; parameters are ~0.5 M so HBM cost is noise.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["WaveRefiner"]


class _DilatedBlock(nn.Module):
    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x):  # (B, W, C)
        h = nn.Conv(self.channels, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME")(x)
        h = nn.gelu(h)
        h = nn.Conv(self.channels, (1,))(h)
        return x + h


class WaveRefiner(nn.Module):
    """Dilated residual conv stack: ``(B, W, 4) -> (B, W)`` delta.

    ``dilations`` default spans a ~4k-sample receptive field -- enough to
    see both contexts across a 2048-sample (128 ms) gap; repeated twice
    for depth.
    """

    channels: int = 64
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128, 256,
                                1, 2, 4, 8, 16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, impaired, ar_fill, neural, gap_ind):
        """All inputs ``(B, W)``; returns the refined window ``(B, W)``.

        Output = ``ar_fill + delta`` inside the gap, untouched ``impaired``
        outside (hard data consistency -- the metric region is the gap)."""
        x = jnp.stack([impaired, ar_fill, neural, gap_ind], axis=-1)
        h = nn.Conv(self.channels, (3,), padding="SAME")(x)
        for d in self.dilations:
            h = _DilatedBlock(self.channels, d)(h)
        h = nn.gelu(nn.Conv(self.channels, (1,))(h))
        # Zero-init final projection: the head starts as the identity on
        # the AR fill (the deployable-SDR baseline) and learns corrections.
        delta = nn.Conv(1, (1,), kernel_init=nn.initializers.zeros)(h)[..., 0]
        refined = ar_fill + delta
        return impaired * (1.0 - gap_ind) + refined * gap_ind


def window_bounds(gap_start, gap_len, window: int, max_gap: int,
                  n_samples: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Start index and in-window gap offset for a ``window``-sample crop
    centered on the (padded) gap: context ``(window - max_gap) // 2`` on
    each side.  Clamped to the signal."""
    ctx = (window - max_gap) // 2
    start = jnp.clip(gap_start - ctx, 0, n_samples - window)
    return start, gap_start - start
