"""MXU-friendly (Bi)LSTM as ``lax.scan`` with hoisted input projections.

The reference's bottleneck is ``nn.LSTM(input_size=16448, hidden=128,
num_layers=3, bidirectional=True)`` running under cuDNN
(``models/CNNBLSTM/model.py:46-47``).  On TPU the recurrence is a sequential
``lax.scan``, so the design goal is to keep the MXU busy inside it
(SURVEY.md §7 "BiLSTM performance"):

* the input projection ``x @ W_ih`` for *all* timesteps is hoisted out of the
  scan into one large ``(B*T, D) x (D, 4H)`` matmul -- this is where nearly
  all FLOPs are for D=16448 >> H=128, and it tiles perfectly onto the MXU;
* the scan body only computes the small recurrent matmul ``h @ W_hh``
  (``(B, H) x (H, 4H)``) plus elementwise gates (VPU);
* the backward direction reuses the same hoisted projection on the reversed
  sequence, and both directions run in one scan over stacked carries.

Gate ordering follows torch (i, f, g, o) so reference checkpoints can be
ported weight-for-weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["lstm_scan", "bilstm_fused_scan", "BiLSTM"]


def lstm_scan(
    xw: jnp.ndarray,
    w_hh: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
    reverse: bool = False,
) -> jnp.ndarray:
    """Run the LSTM recurrence given pre-projected inputs.

    Args:
      xw: ``(B, T, 4H)`` -- inputs already through ``x @ W_ih + b``.
      w_hh: ``(H, 4H)`` recurrent weights.
      h0, c0: ``(B, H)`` initial state.
      reverse: process the sequence right-to-left (for the backward
        direction of a BiLSTM); output is re-reversed to input order.

    Returns:
      ``(B, T, H)`` hidden states.
    """
    hidden = w_hh.shape[0]

    def step(carry, x_t):
        h, c = carry
        gates = x_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    xs = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H): scan over time
    (_, _), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    del hidden
    return jnp.swapaxes(hs, 0, 1)


def bilstm_fused_scan(
    xw_f: jnp.ndarray,
    xw_b: jnp.ndarray,
    w_hh_f: jnp.ndarray,
    w_hh_b: jnp.ndarray,
):
    """Both BiLSTM directions in ONE ``lax.scan`` -- measured NEGATIVE on
    TPU v5e; kept as the recorded experiment, NOT wired as a default.

    Hypothesis: XLA runs two independent ``while`` loops sequentially, so
    stacking the directions into a batched per-step ``(2, B, H) x
    (2, H, 4H)`` dot should halve the sequential step count.  Measured at
    production shapes (B=25, T=417, H=128, v5e): forward 30.9 ms vs 30.2
    separate (parity -- the scan is NOT launch-overhead-bound; per-step
    time scales with work), and the GRADIENT is 1.8x slower (1208 vs
    664 ms -- the batched einsum's reverse-mode transpose lowers badly).
    The production defaults stay: Pallas kernel on TPU, two per-direction
    ``lstm_scan`` calls elsewhere.  Numerically identical to two
    ``lstm_scan`` calls (pinned in tests/test_extras.py).

    Args:
      xw_f, xw_b: ``(B, T, 4H)`` pre-projected inputs per direction.
      w_hh_f, w_hh_b: ``(H, 4H)`` recurrent weights per direction.

    Returns:
      ``(hs_f, hs_b)``: each ``(B, T, H)``, both in input time order.
    """
    H = w_hh_f.shape[0]
    B = xw_f.shape[0]
    # (T, 2, B, 4H): fwd lane in time order, bwd lane time-flipped
    xs = jnp.stack(
        [jnp.swapaxes(xw_f, 0, 1), jnp.swapaxes(xw_b, 0, 1)[::-1]], axis=1
    )
    w = jnp.stack([w_hh_f, w_hh_b])  # (2, H, 4H)

    def step(carry, x_t):
        h, c = carry  # (2, B, H) each
        gates = x_t + jnp.einsum("dbh,dhg->dbg", h, w)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    z = jnp.zeros((2, B, H), xw_f.dtype)
    (_, _), hs = jax.lax.scan(step, (z, z), xs)  # hs: (T, 2, B, H)
    hs_f = jnp.swapaxes(hs[:, 0], 0, 1)
    hs_b = jnp.swapaxes(hs[::-1, 1], 0, 1)
    return hs_f, hs_b


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM, layout-matched to ``torch.nn.LSTM``.

    Output feature dim is ``2 * hidden_dim`` (forward/backward concat), as
    consumed by the reference's projection layer (``model.py:50``).

    ``use_pallas``: run the recurrence as a single Pallas kernel on TPU
    (weights resident in VMEM across all T steps; carry never leaves the
    chip -- see ``ops/pallas/lstm_cell.py``) instead of ``lax.scan``.
    """

    hidden_dim: int
    num_layers: int = 1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        H = self.hidden_dim
        init = nn.initializers.uniform(scale=2.0 / jnp.sqrt(H))  # ~torch U(-1/sqrt H, 1/sqrt H)

        if self.use_pallas:
            from ml_audio_inpainting_tpu.ops.pallas.lstm_cell import (
                lstm_recurrence_pallas,
            )

        for layer in range(self.num_layers):
            outs = []
            for direction in ("fwd", "bwd"):
                d_in = x.shape[-1]
                w_ih = self.param(f"l{layer}_{direction}_w_ih", init, (d_in, 4 * H))
                w_hh = self.param(f"l{layer}_{direction}_w_hh", init, (H, 4 * H))
                b = self.param(f"l{layer}_{direction}_b", nn.initializers.zeros, (4 * H,))
                # Hoisted input projection: one big MXU matmul over all steps.
                xw = x @ w_ih + b
                reverse = direction == "bwd"
                if self.use_pallas:
                    outs.append(lstm_recurrence_pallas(xw, w_hh, reverse))
                else:
                    h0 = jnp.zeros((B, H), x.dtype)
                    c0 = jnp.zeros((B, H), x.dtype)
                    outs.append(lstm_scan(xw, w_hh, h0, c0, reverse=reverse))
            x = jnp.concatenate(outs, axis=-1)  # (B, T, 2H)
        return x
