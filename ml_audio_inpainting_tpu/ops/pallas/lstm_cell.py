"""Pallas TPU kernels: full LSTM recurrence, forward AND backward.

The BiLSTM bottleneck (``ops/lstm.py``) hoists the big input projection out
of the recurrence; what remains is a T-step scan whose body is a small
``(B, H) x (H, 4H)`` matmul plus elementwise gates.  Measured against XLA's
``lax.scan`` at production shapes (B=25, T=417, H=128) on v5e: forward at
parity (~1.8 ms), fused backward ~12% faster (1.97 vs 2.24 ms); the
VMEM-resident design also avoids per-step HBM carry traffic, which grows in
relative importance with batch and hidden size.

Both passes exploit the fact that a TPU Pallas grid executes *sequentially*
on a core: the grid dimension IS the time axis, the recurrent weights live
in VMEM for the whole sweep, and carries persist in VMEM scratch across
grid steps -- zero HBM traffic for state, one kernel launch per sequence.

* Forward: emits the (h, c) state sequences; gates follow torch order
  (i, f, g, o) like ``ops/lstm.py``.
* Backward: reverse-time sweep carrying (dh, dc) and accumulating dW_hh in
  VMEM scratch; gate activations are recomputed from (xw_t, h_{t-1}) so
  nothing beyond the state sequences is saved.
* The reversed direction of a BiLSTM is handled by flipping the time axis
  outside the kernels.

Correctness is pinned against the ``lax.scan`` reference in
``tests/test_extras.py`` (values and gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_recurrence_pallas"]


def _fwd_kernel(xw_ref, whh_ref, h_ref, c_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    gates = xw_ref[0] + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new
    h_ref[0] = h_new.astype(h_ref.dtype)
    c_ref[0] = c_new.astype(c_ref.dtype)


def _bwd_kernel(
    xw_ref, whh_ref, hprev_ref, cprev_ref, c_ref, g_ref,
    dxw_ref, dwhh_ref, dh_scr, dc_scr,
):
    """One reverse-time step: grid index t runs over T-1 .. 0 via index maps."""
    t = pl.program_id(0)

    @pl.when(t == 0)  # first grid step == last time step
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    h_prev = hprev_ref[0].astype(jnp.float32)
    c_prev = cprev_ref[0].astype(jnp.float32)
    c_t = c_ref[0].astype(jnp.float32)

    # Recompute gate activations.
    gates = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h_prev, whh_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32
    )
    H = h_prev.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])

    dh = dh_scr[:] + g_ref[0].astype(jnp.float32)
    tc = jnp.tanh(c_t)
    do = dh * tc
    dc_total = dc_scr[:] + dh * o * (1.0 - tc * tc)
    di = dc_total * g
    df = dc_total * c_prev
    dg = dc_total * i

    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )
    dxw_ref[0] = dgates.astype(dxw_ref.dtype)
    dwhh_ref[:] += jnp.dot(
        h_prev.T, dgates, preferred_element_type=jnp.float32
    ).astype(dwhh_ref.dtype)
    dh_scr[:] = jnp.dot(
        dgates, whh_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32
    )
    dc_scr[:] = dc_total * f


@functools.partial(jax.jit, static_argnames=("interpret",))
def _forward(xw: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool):
    B, T, H4 = xw.shape
    H = H4 // 4
    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H)
    h_seq, c_seq = pl.pallas_call(
        _fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), xw.dtype),
            jax.ShapeDtypeStruct((T, B, H), xw.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_t, w_hh)
    return h_seq, c_seq  # time-major


@functools.partial(jax.jit, static_argnames=("interpret",))
def _backward(xw, w_hh, h_seq, c_seq, g_out, interpret: bool):
    """Gradients wrt (xw, w_hh) given time-major (h_seq, c_seq) and incoming
    time-major gradient ``g_out`` (T, B, H)."""
    T, B, H = h_seq.shape
    H4 = 4 * H
    xw_t = jnp.swapaxes(xw, 0, 1)
    zero = jnp.zeros((1, B, H), h_seq.dtype)
    h_prev = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zero, c_seq[:-1]], axis=0)

    rev = lambda t: (T - 1 - t, 0, 0)
    dxw_t, dwhh = pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), xw.dtype),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_t, w_hh, h_prev, c_prev, c_seq, g_out)
    return jnp.swapaxes(dxw_t, 0, 1), dwhh.astype(w_hh.dtype)


def _scan_reference(xw: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """lax.scan reference implementation (kept for tests/fallbacks)."""
    from ml_audio_inpainting_tpu.ops.lstm import lstm_scan

    B = xw.shape[0]
    H = w_hh.shape[0]
    h0 = jnp.zeros((B, H), xw.dtype)
    c0 = jnp.zeros((B, H), xw.dtype)
    return lstm_scan(xw, w_hh, h0, c0, reverse=reverse)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_recurrence_pallas(xw: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool = False):
    """LSTM recurrence over pre-projected inputs ``(B, T, 4H)`` -> ``(B, T, H)``.

    Both the forward and backward sweeps run as single Pallas kernels on TPU
    (interpret mode elsewhere).  ``reverse`` processes right-to-left (the
    BiLSTM backward direction) by flipping time around the kernels.
    """
    if reverse:
        xw = jnp.flip(xw, axis=1)
    h_seq, _ = _forward(xw, w_hh, _interpret())
    out = jnp.swapaxes(h_seq, 0, 1)
    return jnp.flip(out, axis=1) if reverse else out


def _fwd(xw, w_hh, reverse):
    if reverse:
        xw = jnp.flip(xw, axis=1)
    h_seq, c_seq = _forward(xw, w_hh, _interpret())
    out = jnp.swapaxes(h_seq, 0, 1)
    if reverse:
        out = jnp.flip(out, axis=1)
    return out, (xw, w_hh, h_seq, c_seq)


def _bwd(reverse, residuals, g):
    xw, w_hh, h_seq, c_seq = residuals  # xw already time-flipped if reverse
    if reverse:
        g = jnp.flip(g, axis=1)
    g_t = jnp.swapaxes(g, 0, 1)  # (T, B, H)
    dxw, dwhh = _backward(xw, w_hh, h_seq, c_seq, g_t, _interpret())
    if reverse:
        dxw = jnp.flip(dxw, axis=1)
    return dxw, dwhh


lstm_recurrence_pallas.defvjp(_fwd, _bwd)
