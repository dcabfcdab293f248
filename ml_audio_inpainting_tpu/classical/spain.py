"""SPAIN (SParse Audio INpainter): A-SPAIN and S-SPAIN on the DFT frame.

Reference implementations: ``models/AudioReg/references/spain/`` --
ADMM-style loops alternating hard thresholding in a DFT frame with a
time-domain consistency projection and a dual update, sparsity ``k`` relaxed
by ``s`` every ``r`` iterations (``aspain.m:42-97``, ``sspain.m:44-100``),
run per OLA window (``spain_segmentation.m:37-102``).

TPU-first notes:

* The DFT frame ``frana``/``frsyn`` of a ``w``-sample window is the unitary
  FFT pair ``fft(x)/sqrt(w)`` / ``ifft(z)*sqrt(w)``; windows are batched so
  each SPAIN iteration is a batched FFT + top-k threshold + projection.
* Hard thresholding follows ``hard_thresholding.m:1-33``: rank on the
  half-spectrum with the DC bin halved, keep the ``k`` largest, mirror the
  conjugate pairs.  The traced (growing) ``k`` uses a sorted-threshold
  formulation instead of a static top-k.
* The reference's per-block ``fftshift`` is a pure phase rotation of DFT
  coefficients (magnitudes unchanged), so it is dropped.
* S-SPAIN supports both f-update approximations (``sspain.m:4-6``): 'H'
  (hard thresholding) and 'OMP' (:func:`omp_approximation` -- greedy
  conjugate-pair selection + least-squares re-fit over an oversampled DFT
  dictionary, as a fixed-length ``fori_loop`` with a static Cholesky).
* Early termination (``objVal <= epsilon``) becomes a freeze flag inside a
  static-length ``lax.scan`` -- uniform compute, fused end to end.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ml_audio_inpainting_tpu.classical.ola import ola_windows

__all__ = [
    "hard_threshold_dft",
    "omp_approximation",
    "aspain_core",
    "sspain_core",
    "spain_inpaint",
]


def _frana(x: jnp.ndarray) -> jnp.ndarray:
    w = x.shape[-1]
    return jnp.fft.fft(x) / jnp.sqrt(1.0 * w)


def _frsyn(z: jnp.ndarray) -> jnp.ndarray:
    w = z.shape[-1]
    return jnp.real(jnp.fft.ifft(z) * jnp.sqrt(1.0 * w))


def hard_threshold_dft(z: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Keep the ``k`` largest half-spectrum coefficients (conjugate pairs
    counted once, DC halved) -- ``hard_thresholding.m:1-33``."""
    w = z.shape[-1]
    nhalf = w // 2 + 1
    half = z[..., :nhalf]
    half = half.at[..., 0].multiply(0.5)
    mags = jnp.abs(half)
    sorted_desc = jnp.sort(mags, axis=-1)[..., ::-1]
    kc = jnp.clip(k, 1, nhalf)
    thresh = jnp.take_along_axis(sorted_desc, (kc - 1)[..., None], axis=-1)
    keep = mags >= thresh
    s = jnp.where(keep, half, 0.0)
    s = s.at[..., 0].multiply(2.0)
    if w % 2 == 0:
        mirror = jnp.conj(s[..., 1:-1][..., ::-1])
    else:
        mirror = jnp.conj(s[..., 1:][..., ::-1])
    return jnp.concatenate([s, mirror], axis=-1)


@functools.partial(jax.jit, static_argnames=("maxit", "s", "r"))
def aspain_core(
    gapped: jnp.ndarray,
    mask: jnp.ndarray,
    maxit: int = 100,
    s: int = 1,
    r: int = 1,
    epsilon: float = 1e-3,
) -> jnp.ndarray:
    """A-SPAIN on one window (``aspain.m:42-97``).

    ``gapped``: ``(w,)`` block (already analysis-windowed); ``mask``:
    1 = reliable.  Returns the restored block.
    """
    x0 = jnp.where(mask > 0, gapped, 0.0)
    z0 = _frana(x0)
    u0 = jnp.zeros_like(z0)

    def body(carry, it):
        x_hat, zEst, u, k, best, best_obj, done = carry
        z_bar = hard_threshold_dft(zEst + u, k)
        obj = jnp.linalg.norm(zEst - z_bar)
        improved = (obj <= best_obj) & ~done
        best = jnp.where(improved, x_hat, best)
        best_obj = jnp.where(improved, obj, best_obj)
        done = done | (obj <= epsilon)

        syn = _frsyn(z_bar - u)
        x_new = jnp.where(mask > 0, x0, syn)  # proj_time.m:15-17
        z_new = _frana(x_new)
        u_new = u + z_new - z_bar

        k_new = jnp.where((it + 2) % r == 0, k + s, k)
        x_hat = jnp.where(done, x_hat, x_new)
        zEst = jnp.where(done, zEst, z_new)
        u = jnp.where(done, u, u_new)
        k = jnp.where(done, k, k_new)
        return (x_hat, zEst, u, k, best, best_obj, done), None

    init = (x0, z0, u0, jnp.asarray(s), x0, jnp.asarray(jnp.inf, x0.dtype), jnp.zeros((), bool))
    (x_hat, _, _, _, best, _, _), _ = jax.lax.scan(
        body, init, jnp.arange(maxit)
    )
    return best


def omp_approximation(
    sdata: jnp.ndarray, k: jnp.ndarray, max_k: int, redundancy: int = 2
) -> jnp.ndarray:
    """Orthogonal matching pursuit over the oversampled DFT pair dictionary.

    The reference's OMP f-update is ``franamp(param.F, s, 'omp', 'qr',
    'maxit', k)`` with conjugate atoms (``sspain.m:6,62``): greedily select
    ``k`` conjugate-symmetric atom pairs, re-fitting all coefficients by
    least squares after every selection.  Here the (real-signal) dictionary
    is the pair family ``{cos(2*pi*j*n/M), sin(2*pi*j*n/M)}``,
    ``M = redundancy * w`` -- at ``redundancy=1`` this is the same frame as
    :func:`hard_threshold_dft` (where OMP coincides with thresholding, the
    dictionary being orthogonal); oversampling makes OMP strictly more
    expressive on off-grid content.

    TPU-first shape discipline: a fixed ``max_k`` selection loop with
    freeze-at-``k`` semantics (the traced ``k`` grows across S-SPAIN
    iterations), selection via one ``rfft`` of the residual per step, and
    the LS re-fit as a static ``(2*max_k, 2*max_k)`` Cholesky solve with
    identity padding on empty/zero-norm slots.

    Returns the LS approximation ``xEst`` (the reference's
    ``frsyn(z_bar)``).
    """
    w = sdata.shape[-1]
    M = redundancy * w
    nhalf = M // 2 + 1
    dtype = sdata.dtype
    n = jnp.arange(w, dtype=dtype)
    kc = jnp.clip(k, 1, max_k)
    eye2k = jnp.eye(2 * max_k, dtype=dtype)

    def build_ls(sel):
        """LS re-fit on the selected pair bins (sel: (max_k,) int, -1 = empty)."""
        valid = (sel >= 0).astype(dtype)
        angles = (2.0 * jnp.pi / M) * jnp.clip(sel, 0, None).astype(dtype)[:, None] * n
        A = jnp.concatenate(
            [jnp.cos(angles) * valid[:, None], jnp.sin(angles) * valid[:, None]]
        )  # (2*max_k, w)
        G = A @ A.T
        # Empty slots and zero-norm atoms (sin at DC/Nyquist) -> unit diagonal.
        diag = jnp.diagonal(G)
        G = G + eye2k * jnp.where(diag < 1e-9, 1.0, 1e-7 * jnp.maximum(diag, 1.0))
        rhs = A @ sdata
        L = jnp.linalg.cholesky(G)
        z = jax.scipy.linalg.cho_solve((L, True), rhs)
        return A.T @ z

    def step(i, carry):
        sel, taken, approx = carry
        resid = sdata - approx
        rc = jnp.fft.rfft(resid, n=M)
        energy = jnp.where(taken, -jnp.inf, jnp.abs(rc))
        j = jnp.argmax(energy).astype(jnp.int32)
        active = i < kc
        sel = sel.at[i].set(jnp.where(active, j, jnp.int32(-1)))
        taken = taken.at[j].set(taken[j] | active)
        new_approx = build_ls(sel)
        approx = jnp.where(active, new_approx, approx)
        return sel, taken, approx

    sel0 = jnp.full((max_k,), -1, jnp.int32)
    taken0 = jnp.zeros((nhalf,), bool)
    with jax.default_matmul_precision("highest"):
        _, _, approx = jax.lax.fori_loop(
            0, max_k, step, (sel0, taken0, jnp.zeros_like(sdata))
        )
    return approx


@functools.partial(
    jax.jit, static_argnames=("maxit", "s", "r", "f_update", "max_k", "redundancy")
)
def sspain_core(
    gapped: jnp.ndarray,
    mask: jnp.ndarray,
    maxit: int = 100,
    s: int = 1,
    r: int = 1,
    epsilon: float = 1e-3,
    f_update: str = "h",
    max_k: int = 32,
    redundancy: int = 2,
) -> jnp.ndarray:
    """S-SPAIN (``sspain.m:44-100``) with either f-update approximation:

    * ``f_update="h"``: hard thresholding of the unitary DFT coefficients
      (``sspain.m:61``).
    * ``f_update="omp"``: orthogonal matching pursuit with conjugate atom
      pairs over the ``redundancy``-times oversampled DFT dictionary
      (``sspain.m:62``), capped at ``max_k`` pairs.
    """
    x0 = jnp.where(mask > 0, gapped, 0.0)
    u0 = jnp.zeros_like(x0)

    def f_update_fn(sig, k):
        if f_update == "omp":
            return omp_approximation(sig, k, max_k=max_k, redundancy=redundancy)
        return _frsyn(hard_threshold_dft(_frana(sig), k))

    def body(carry, it):
        x_hat, u, k, best, best_obj, done = carry
        xEst = f_update_fn(x_hat - u, k)
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

    init = (x0, u0, jnp.asarray(s), x0, jnp.asarray(jnp.inf, x0.dtype), jnp.zeros((), bool))
    (_, _, _, best, _, _), _ = jax.lax.scan(body, init, jnp.arange(maxit))
    return best


@functools.partial(
    jax.jit,
    static_argnames=("algorithm", "maxit", "s", "r", "wtype", "w", "a", "max_gap"),
)
def spain_inpaint(
    signal: jnp.ndarray,
    mask: jnp.ndarray,
    gap_start: jnp.ndarray,
    gap_len: jnp.ndarray,
    algorithm: str = "aspain",
    maxit: int = 100,
    s: int = 1,
    r: int = 1,
    epsilon: float = 1e-3,
    wtype: str = "hann",
    w: int = 4096,
    a: int = 1024,
    max_gap: int = 2048,
) -> jnp.ndarray:
    """Segment-wise SPAIN over one contiguous gap (``spain_segmentation.m``).

    ``algorithm``: ``"aspain"`` | ``"sspain"`` (H f-update) |
    ``"sspain_omp"`` (OMP f-update).

    Only the (static) K windows that can touch the gap are processed -- as a
    batched SPAIN solve -- and reliable samples are restored verbatim at the
    end (``spain_segmentation.m:98-99``).
    """
    n = signal.shape[-1]
    dtype = signal.dtype
    gana, gsyn = ola_windows(wtype, w, dtype)
    x = jnp.where(mask > 0, signal, 0.0)

    K = (max_gap + w) // a + 2
    half = w // 2
    k0 = (gap_start + half - w) // a + 1

    pad = w + a * K + max_gap
    xp = jnp.pad(x, (pad, pad))
    mp = jnp.pad(mask, (pad, pad), constant_values=1.0)
    ks = k0 + jnp.arange(K)
    starts = ks * a - half + pad

    def gather(vec, st):
        return jax.lax.dynamic_slice(vec, (st,), (w,))

    seg_data = jax.vmap(lambda st: gather(xp, st))(starts) * gana
    seg_mask = jax.vmap(lambda st: gather(mp, st))(starts)
    any_miss = jnp.any(seg_mask <= 0, axis=-1)

    if algorithm == "aspain":
        core = aspain_core
    elif algorithm == "sspain_omp":
        core = functools.partial(sspain_core, f_update="omp")
    else:
        core = sspain_core
    solved = jax.vmap(lambda d, m: core(d, m, maxit=maxit, s=s, r=r, epsilon=epsilon))(
        seg_data, seg_mask
    )
    solved = jnp.where(any_miss[:, None], solved, seg_data)

    num = jnp.zeros_like(xp)

    def accumulate(acc, inputs):
        st, sol, dat = inputs
        acc = jax.lax.dynamic_update_slice(
            acc, gather(acc, st) + gsyn * (sol - dat), (st,)
        )
        return acc, None

    num, _ = jax.lax.scan(accumulate, num, (starts, solved, seg_data), length=K)

    taps = -(-w // a)
    gg = jnp.pad(gana * gsyn, (0, taps * a - w)).reshape(taps, a)
    profile = jnp.sum(gg, axis=0)
    phase = (jnp.arange(xp.shape[0]) - starts[0]) % a
    power = jnp.where(profile[phase] > 0, profile[phase], 1.0)

    out = (xp + num / power)[pad : pad + n]
    # Reliable samples verbatim (spain_segmentation.m:98-99).
    return jnp.where(mask > 0, signal, out)
