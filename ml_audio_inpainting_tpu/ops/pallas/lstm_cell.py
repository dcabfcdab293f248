"""Pallas TPU kernel: full LSTM recurrence in one kernel launch.

The BiLSTM bottleneck (``ops/lstm.py``) hoists the big input projection out
of the recurrence; what remains is a T-step scan whose body is a small
``(B, H) x (H, 4H)`` matmul plus elementwise gates.  Under ``lax.scan`` each
step is a separate XLA loop iteration reading/writing carry state through
HBM.  This kernel exploits the fact that a TPU Pallas grid executes
*sequentially* on a core: the grid dimension IS the time axis, the recurrent
weights live in VMEM for the whole sweep, and the (h, c) carry persists in
VMEM scratch across grid steps -- zero HBM traffic for state, one kernel
launch for the whole sequence.

Layout notes:
* ``xw``: (T, B, 4H) pre-projected inputs; blocked (1, B, 4H) per grid step.
* gates follow torch order (i, f, g, o) like ``ops/lstm.py``.
* reverse=True runs the sweep back-to-front via the BlockSpec index map --
  the backward half of a BiLSTM reuses the same kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_recurrence_pallas"]


def _lstm_kernel(xw_ref, whh_ref, out_ref, h_scr, c_scr):
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
    out_ref[0] = h_new.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _pallas_forward(
    xw: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool, interpret: bool
) -> jnp.ndarray:
    B, T, H4 = xw.shape
    H = H4 // 4
    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H)

    if reverse:
        idx = lambda t: (T - 1 - t, 0, 0)
    else:
        idx = lambda t: (t, 0, 0)

    out = pl.pallas_call(
        _lstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_t, w_hh)
    return jnp.swapaxes(out, 0, 1)


def _scan_reference(xw: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """lax.scan reference implementation -- used for the backward pass."""
    from ml_audio_inpainting_tpu.ops.lstm import lstm_scan

    B = xw.shape[0]
    H = w_hh.shape[0]
    h0 = jnp.zeros((B, H), xw.dtype)
    c0 = jnp.zeros((B, H), xw.dtype)
    return lstm_scan(xw, w_hh, h0, c0, reverse=reverse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_recurrence_pallas(xw: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool = False):
    """LSTM recurrence over pre-projected inputs ``(B, T, 4H)`` -> ``(B, T, H)``.

    Forward runs as one Pallas kernel on TPU (interpret mode elsewhere);
    backward recomputes through the ``lax.scan`` reference so the op remains
    differentiable end to end.
    """
    interpret = jax.default_backend() != "tpu"
    return _pallas_forward(xw, w_hh, reverse, interpret)


def _fwd(xw, w_hh, reverse):
    return lstm_recurrence_pallas(xw, w_hh, reverse), (xw, w_hh)


def _bwd(reverse, residuals, g):
    xw, w_hh = residuals
    _, vjp = jax.vjp(lambda a, b: _scan_reference(a, b, reverse), xw, w_hh)
    return vjp(g)


lstm_recurrence_pallas.defvjp(_fwd, _bwd)
