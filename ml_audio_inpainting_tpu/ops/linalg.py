"""AR model estimation: Levinson-Durbin (lpc) and Burg, jit/vmap friendly.

These are the TPU equivalents of MATLAB's ``lpc``/``arburg`` as used by the
classical inpainting suite (``models/AudioReg/utils/janssen_inp.m:97-102``,
``arinpaint.m:25-29``).  Both run with static order ``p`` as
``lax.fori_loop`` recursions over fixed-shape state, so a batch of fits
(one per gap or per OLA segment) is a single ``vmap``-ed XLA program --
replacing the reference's MATLAB ``parfor`` (SURVEY.md §2.6).

All math in float64-capable form (pass float64 inputs under ``jax.enable_x64``
for MATLAB-grade conditioning; float32 works for the production path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["autocorrelation", "levinson", "lpc", "arburg", "ar_coef_autocorr"]


def autocorrelation(x: jnp.ndarray, maxlag: int) -> jnp.ndarray:
    """Biased autocorrelation r[0..maxlag] of ``(..., N)`` via FFT.

    Matches MATLAB ``lpc``'s internal ``xcorr(x, 'biased')`` normalization
    (divide by N).
    """
    n = x.shape[-1]
    nfft = 1
    while nfft < 2 * n:
        nfft *= 2
    X = jnp.fft.rfft(x, n=nfft)
    r = jnp.fft.irfft(X * jnp.conj(X), n=nfft)[..., : maxlag + 1]
    return r / n


@functools.partial(jax.jit, static_argnames=("p",))
def levinson(r: jnp.ndarray, p: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin recursion on autocorrelation ``r[0..p]``.

    Returns ``(a, e)`` with ``a = [1, a1..ap]`` (error-filter convention,
    as MATLAB ``lpc``) and final prediction error ``e``.
    """
    dtype = r.dtype
    a0 = jnp.zeros((p + 1,), dtype).at[0].set(1.0)
    idx = jnp.arange(p + 1)

    def body(m, carry):
        a, e = carry
        # acc = sum_{j=0}^{m-1} a[j] * r[m-j]
        rj = jnp.where(idx <= m, r[jnp.clip(m - idx, 0, p)], 0.0)
        acc = jnp.sum(jnp.where(idx <= m - 1, a * rj, 0.0))
        k = -(acc) / jnp.where(e == 0, 1.0, e)
        k = jnp.where(e == 0, 0.0, k)
        # a[j] += k * a[m-j] for j=1..m-1; a[m] = k
        a_flipped = jnp.where(
            (idx >= 1) & (idx <= m - 1), a[jnp.clip(m - idx, 0, p)], 0.0
        )
        a_new = a + k * a_flipped
        a_new = a_new.at[m].set(k)
        e_new = e * (1.0 - k * k)
        return (a_new, e_new)

    a, e = jax.lax.fori_loop(1, p + 1, body, (a0, r[0]))
    return a, e


@functools.partial(jax.jit, static_argnames=("p",))
def lpc(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Linear-prediction coefficients ``[1, a1..ap]`` (MATLAB ``lpc``)."""
    r = autocorrelation(x, p)
    a, _ = levinson(r, p)
    return a


@functools.partial(jax.jit, static_argnames=("p",))
def arburg(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Burg-method AR coefficients ``[1, a1..ap]`` (MATLAB ``arburg``).

    Standard Burg recursion on forward/backward prediction errors; fixed
    shapes with index masking so it stays jittable for any static ``p``.
    """
    n = x.shape[-1]
    dtype = x.dtype
    idx_n = jnp.arange(n)
    idx_p = jnp.arange(p + 1)

    # Literal shrinking-array Burg: at step m the error arrays lose one
    # element (ef drops its head, eb its tail); we keep fixed length n and
    # mask the valid prefix (length n - m after step m).
    ef0 = x
    eb0 = x
    a0 = jnp.zeros((p + 1,), dtype).at[0].set(1.0)

    def body(m, carry):
        ef, eb, a = carry
        valid = idx_n < (n - m)
        efp = jnp.where(valid, jnp.roll(ef, -1), 0.0)  # ef[1:]
        ebp = jnp.where(valid, eb, 0.0)  # eb[:-1]
        num = -2.0 * jnp.sum(efp * ebp)
        den = jnp.sum(efp * efp) + jnp.sum(ebp * ebp)
        k = num / jnp.where(den == 0, 1.0, den)
        k = jnp.where(den == 0, 0.0, k)

        ef_new = efp + k * ebp
        eb_new = ebp + k * efp

        a_flipped = jnp.where(
            (idx_p >= 1) & (idx_p <= m), a[jnp.clip(m - idx_p, 0, p)], 0.0
        )
        a_new = a + k * a_flipped
        return (ef_new, eb_new, a_new)

    _, _, a = jax.lax.fori_loop(1, p + 1, body, (ef0, eb0, a0))
    return a


@functools.partial(jax.jit, static_argnames=("p",))
def ar_coef_autocorr(coef: jnp.ndarray, p: int) -> jnp.ndarray:
    """``b[k] = sum_j coef[j] * coef[j+k]`` for k=0..p.

    The banded normal-equation generator of the Janssen solver: the
    reference computes it as ``coef' * hankel(coef', ...)``
    (``janssen_inp.m:106``); here it is a direct correlation.
    """
    def one(k):
        shifted = jnp.where(jnp.arange(p + 1) + k <= p, jnp.roll(coef, -k), 0.0)
        return jnp.sum(coef * shifted)

    return jax.vmap(one)(jnp.arange(p + 1))
