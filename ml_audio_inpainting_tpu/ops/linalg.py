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

__all__ = [
    "autocorrelation",
    "levinson",
    "lpc",
    "arburg",
    "ar_coef_autocorr",
    "block_tridiag_cholesky_solve",
]


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


def block_tridiag_cholesky_solve(
    D: jnp.ndarray, E: jnp.ndarray, rhs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve ``A x = rhs`` for an SPD block-tridiagonal ``A``.

    The long-gap Janssen system is banded -- an SPD Toeplitz matrix of
    bandwidth ``p`` far smaller than the gap (512 vs 8000 at 500 ms)
    (``janssen_inp.m:105-113``) -- so the dense ``(gap, gap)`` Cholesky of
    the short-gap path wastes O(n^3) FLOPs and O(n^2) HBM.  Partitioned
    into ``q >= p`` blocks the matrix is block-tridiagonal and its Cholesky
    factor block-bidiagonal; the factorization is a ``lax.scan`` of
    ``(q, q)`` Cholesky/triangular-solve/matmul steps -- MXU-shaped tiles,
    O(n q^2) FLOPs, O(n q) memory.

    Args:
      D: ``(nb, q, q)`` diagonal blocks.
      E: ``(nb, q, q)`` sub-diagonal blocks, ``E[k] = A[(k+1)q:(k+2)q,
        kq:(k+1)q]``; ``E[nb-1]`` is ignored (no block below the last).
      rhs: ``(nb * q,)``.

    Returns ``(x, ok)``: the solution ``(nb * q,)`` and a scalar bool that
    is False if any block factorization produced non-finite values (the
    functional analogue of the reference's Cholesky-failure bail-out,
    ``janssen_inp.m:108-111``).
    """
    nb, q, _ = D.shape
    dtype = D.dtype
    solve_tri = jax.scipy.linalg.solve_triangular

    # E_prev[k] = L-block coupling block k to k-1 (zero for k=0).
    E_prev = jnp.concatenate([jnp.zeros((1, q, q), dtype), E[:-1]], axis=0)

    def fact_step(L_prev, inputs):
        Dk, Ekm1 = inputs
        # C = E_{k-1} @ inv(L_{k-1})^T via triangular solve; exact zero for
        # the first block because E_prev[0] == 0.
        C = solve_tri(L_prev, Ekm1.T, lower=True).T
        L = jnp.linalg.cholesky(Dk - C @ C.T)
        return L, (L, C)

    L0 = jnp.eye(q, dtype=dtype)
    _, (Ls, Cs) = jax.lax.scan(fact_step, L0, (D, E_prev))
    ok = jnp.all(jnp.isfinite(Ls)) & jnp.all(jnp.isfinite(Cs))
    # A failed (indefinite) block yields NaNs that propagate through the
    # scan; replace with identity so the solves below stay finite and the
    # caller can act on ``ok``.
    Ls = jnp.where(ok, Ls, jnp.broadcast_to(jnp.eye(q, dtype=dtype), Ls.shape))
    Cs = jnp.where(ok, Cs, jnp.zeros_like(Cs))

    r = rhs.reshape(nb, q)

    def fwd_step(y_prev, inputs):
        L, C, rk = inputs
        y = solve_tri(L, rk - C @ y_prev, lower=True)
        return y, y

    _, ys = jax.lax.scan(fwd_step, jnp.zeros((q,), dtype), (Ls, Cs, r))

    # Backward: L^T x = y, using C_{k+1} = L_{k+1,k} (zero above the last).
    C_next = jnp.concatenate([Cs[1:], jnp.zeros((1, q, q), dtype)], axis=0)

    def bwd_step(x_next, inputs):
        L, Cn, yk = inputs
        x = solve_tri(L.T, yk - Cn.T @ x_next, lower=False)
        return x, x

    _, xs = jax.lax.scan(
        bwd_step, jnp.zeros((q,), dtype), (Ls[::-1], C_next[::-1], ys[::-1])
    )
    return xs[::-1].reshape(nb * q), ok
