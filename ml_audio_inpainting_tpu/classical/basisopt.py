"""Learned-basis SPAIN: unitary sparsifying-basis optimization + inpainting.

Reference: ``models/AudioReg/references/basisopt/`` --

* ``basis_opt_new.m``: find a unitary ``B`` minimizing ``||B X_tr||_1`` over
  training coefficient vectors by repeatedly composing banded-Hermitian
  matrix exponentials ``B <- expm(j 2pi A) B`` where each ``A`` solves a
  CVX-linearized L1 subproblem under a shrinking infinity-norm ``level``.
* ``a_spain_learned.m`` / ``s_spain_learned.m``: the SPAIN loop run on
  ``B @ dgtreal(x)`` coefficients with column-wise hard thresholding
  (``hard_thresholding_dgtreal.m``: DC/Nyquist rows scaled by 1/sqrt(2)
  for ranking, k largest kept per column).

JAX re-design: the CVX subproblem becomes Adam on the banded-Hermitian
parameters (real diagonal + one complex off-diagonal) with the same
``|A| <= level`` clamp and the same trust-region composition/shrink loop;
``expm`` is ``jax.scipy.linalg.expm``.  The analysis/synthesis pair is this
framework's STFT (a DGT up to phase convention, which the unitary mixing is
invariant to).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ml_audio_inpainting_tpu.ops.stft import istft, stft

__all__ = [
    "optimize_basis",
    "hard_threshold_columns",
    "aspain_learned",
    "sspain_learned",
]


def _banded_hermitian(diag: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    """Hermitian matrix with real diagonal ``diag`` (N,) and first
    off-diagonal ``off`` (N-1,) complex (``basis_opt_new.m`` off_diags=1)."""
    n = diag.shape[0]
    A = jnp.zeros((n, n), jnp.complex64)
    A = A + jnp.diag(diag.astype(jnp.complex64))
    A = A + jnp.diag(off, 1) + jnp.diag(jnp.conj(off), -1)
    return A


def optimize_basis(
    X_tr: jnp.ndarray,
    level_init: float = 1e-2,
    epsilon: float = 1e-4,
    inner_steps: int = 200,
    inner_lr: float = 1e-3,
    max_outer: int = 20,
    seed: int = 0,
) -> Tuple[jnp.ndarray, float, float]:
    """Optimize a unitary sparsifying basis for columns of ``X_tr`` (N, M).

    Returns ``(Basis, sparsity_init, sparsity_final)`` like
    ``basis_opt_new.m``.
    """
    N = X_tr.shape[0]
    X_tr = X_tr.astype(jnp.complex64)
    B = jnp.eye(N, dtype=jnp.complex64)
    sparsity_init = float(jnp.sum(jnp.abs(X_tr)))
    sparsity = sparsity_init
    sparsity_old = jnp.inf
    level = level_init
    cnt = 0

    @jax.jit
    def subproblem_loss(params, Y, lvl):
        d = jnp.clip(params["diag"], -lvl, lvl)
        o_r = jnp.clip(params["off_r"], -lvl, lvl)
        o_i = jnp.clip(params["off_i"], -lvl, lvl)
        A = _banded_hermitian(d, o_r + 1j * o_i)
        Z = Y + 2j * jnp.pi * (A @ Y)
        return jnp.sum(jnp.abs(Z))

    grad_fn = jax.jit(jax.grad(subproblem_loss))

    while level > epsilon and cnt < max_outer:
        improved_any = False
        while sparsity < sparsity_old and cnt < max_outer:
            Y = B @ X_tr
            params = {
                "diag": jnp.zeros((N,)),
                "off_r": jnp.zeros((N - 1,)),
                "off_i": jnp.zeros((N - 1,)),
            }
            opt = optax.adam(inner_lr)
            opt_state = opt.init(params)
            for _ in range(inner_steps):
                g = grad_fn(params, Y, level)
                updates, opt_state = opt.update(g, opt_state)
                params = optax.apply_updates(params, updates)
                params = jax.tree_util.tree_map(
                    lambda p: jnp.clip(p, -level, level), params
                )
            A = _banded_hermitian(
                params["diag"], params["off_r"] + 1j * params["off_i"]
            )
            B_new = jax.scipy.linalg.expm(2j * jnp.pi * A) @ B
            new_sparsity = float(jnp.sum(jnp.abs(B_new @ X_tr)))
            cnt += 1
            if new_sparsity < sparsity:
                sparsity_old_save = sparsity_old
                sparsity_old = sparsity
                B_old = B
                B = B_new
                sparsity = new_sparsity
                improved_any = True
            else:
                break
        level = level / 2
        if improved_any:
            sparsity_old = jnp.inf  # allow further descent at the finer level
    sparsity_final = float(jnp.sum(jnp.abs(B @ X_tr)))
    return B, sparsity_init, sparsity_final


def hard_threshold_columns(C: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Keep the ``k`` largest entries per column of ``(F, cols)``, ranking
    with DC/last rows down-weighted by 1/sqrt(2)
    (``hard_thresholding_dgtreal.m:1-25``)."""
    F = C.shape[0]
    weights = jnp.ones((F, 1)).at[0].set(1 / jnp.sqrt(2.0)).at[-1].set(1 / jnp.sqrt(2.0))
    mags = jnp.abs(C) * weights
    sorted_desc = jnp.sort(mags, axis=0)[::-1]
    kc = jnp.clip(k, 1, F)
    thresh = sorted_desc[kc - 1][None, :]
    return jnp.where(mags >= jnp.maximum(thresh, 1e-30), C, 0.0)


@functools.partial(
    jax.jit, static_argnames=("maxit", "s", "r", "n_fft", "hop_length", "win_length")
)
def aspain_learned(
    gapped: jnp.ndarray,
    mask: jnp.ndarray,
    basis: jnp.ndarray,
    maxit: int = 100,
    s: int = 1,
    r: int = 1,
    epsilon: float = 1e-3,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: int = 512,
) -> jnp.ndarray:
    """A-SPAIN over learned-basis STFT coefficients (``a_spain_learned.m``).

    ``basis``: unitary ``(F, F)`` from :func:`optimize_basis` (identity
    recovers plain per-column SPAIN).  ``mask``: 1 = reliable sample.
    """
    n = gapped.shape[-1]
    Bh = jnp.conj(basis).T

    def ana(x):
        return basis @ stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length)

    def syn(z):
        return istft(
            Bh @ z, n_fft=n_fft, hop_length=hop_length, win_length=win_length, length=n
        )

    x0 = jnp.where(mask > 0, gapped, 0.0)
    z0 = ana(x0)
    u0 = jnp.zeros_like(z0)

    def body(carry, it):
        x_hat, zEst, u, k, best, best_obj, done = carry
        z_bar = hard_threshold_columns(zEst + u, k)
        obj = jnp.linalg.norm(zEst - z_bar)
        improved = (obj <= best_obj) & ~done
        best = jnp.where(improved, x_hat, best)
        best_obj = jnp.where(improved, obj, best_obj)
        done = done | (obj <= epsilon)

        x_new = jnp.where(mask > 0, x0, syn(z_bar - u))
        z_new = ana(x_new)
        u_new = u + z_new - z_bar
        k_new = jnp.where((it + 2) % r == 0, k + s, k)

        x_hat = jnp.where(done, x_hat, x_new)
        zEst = jnp.where(done, zEst, z_new)
        u = jnp.where(done, u, u_new)
        k = jnp.where(done, k, k_new)
        return (x_hat, zEst, u, k, best, best_obj, done), None

    init = (
        x0, z0, u0, jnp.asarray(s), x0,
        jnp.asarray(jnp.inf, jnp.float32), jnp.zeros((), bool),
    )
    (_, _, _, _, best, _, _), _ = jax.lax.scan(body, init, jnp.arange(maxit))
    return best


@functools.partial(
    jax.jit, static_argnames=("maxit", "s", "r", "n_fft", "hop_length", "win_length")
)
def sspain_learned(
    gapped: jnp.ndarray,
    mask: jnp.ndarray,
    basis: jnp.ndarray,
    maxit: int = 100,
    s: int = 1,
    r: int = 1,
    epsilon: float = 1e-3,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: int = 512,
) -> jnp.ndarray:
    """S-SPAIN over learned-basis STFT coefficients (``s_spain_learned.m``,
    'H' f-update): threshold in the synthesis-side problem
    ``z_bar = H_k(A(x - u))``, project, dual-update in the time domain."""
    n = gapped.shape[-1]
    Bh = jnp.conj(basis).T

    def ana(x):
        return basis @ stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length)

    def syn(z):
        return istft(
            Bh @ z, n_fft=n_fft, hop_length=hop_length, win_length=win_length, length=n
        )

    x0 = jnp.where(mask > 0, gapped, 0.0)
    u0 = jnp.zeros_like(x0)

    def body(carry, it):
        x_hat, u, k, best, best_obj, done = carry
        z_bar = hard_threshold_columns(ana(x_hat - u), k)
        xEst = syn(z_bar)
        obj = jnp.linalg.norm(xEst - x_hat)
        improved = (obj <= best_obj) & ~done
        best = jnp.where(improved, x_hat, best)
        best_obj = jnp.where(improved, obj, best_obj)
        done = done | (obj <= epsilon)

        x_new = jnp.where(mask > 0, x0, xEst + u)
        u_new = u + xEst - x_new
        k_new = jnp.where((it + 2) % r == 0, k + s, k)

        x_hat = jnp.where(done, x_hat, x_new)
        u = jnp.where(done, u, u_new)
        k = jnp.where(done, k, k_new)
        return (x_hat, u, k, best, best_obj, done), None

    init = (
        x0, u0, jnp.asarray(s), x0,
        jnp.asarray(jnp.inf, jnp.float32), jnp.zeros((), bool),
    )
    (_, _, _, best, _, _), _ = jax.lax.scan(body, init, jnp.arange(maxit))
    return best
