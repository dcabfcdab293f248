"""Windowed overlap-add segmentation for classical inpainting.

Reference: ``models/AudioReg/utils/segmentation_inp.m`` -- pad the signal to
the shift grid, cut ``w``-sample windows every ``a`` samples (hann / rect /
tukey analysis-synthesis pairs), run the Janssen solver per window in a
MATLAB ``parfor``, and recombine by overlap-add with a
``sum(g_ana * g_syn)`` rescale.

TPU-first design (SURVEY.md §5.7): only the ``K`` windows whose support can
intersect the gap are solved (``K`` is static from the gap-length bound);
they run as one ``vmap``-ed batched Janssen solve.  All untouched windows
pass through OLA as the identity (window * dual summed and rescaled), so the
full-signal OLA reduces to a local update around the gap -- the rest of the
signal is returned bit-identical.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.classical.janssen import janssen

__all__ = ["ola_windows", "segmentation_inpaint"]


def ola_windows(wtype: str, w: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(analysis, synthesis) window pair for OLA segmentation.

    ``hann``: peak-normalized periodic Hann for both (the OLA rescale by
    ``sum(g_ana * g_syn)`` makes reconstruction exact, standing in for the
    reference's LTFAT ``gabdual`` pair, ``segmentation_inp.m:73-87``).
    ``rect``: ones analysis, Hann synthesis (``segmentation_inp.m:74-78``).
    ``tukey``: Tukey(0.5) for both (``segmentation_inp.m:79-81``).
    """
    n = np.arange(w)
    hann = (0.5 - 0.5 * np.cos(2 * np.pi * n / w)).astype(np.float64)
    if wtype == "hann":
        g = hann / hann.max()
        return jnp.asarray(g, dtype), jnp.asarray(g, dtype)
    if wtype == "rect":
        return jnp.ones((w,), dtype), jnp.asarray(hann / hann.max(), dtype)
    if wtype == "tukey":
        r = 0.5
        t = np.ones(w)
        edge = int(np.floor(r * (w - 1) / 2))
        ramp = 0.5 * (1 + np.cos(np.pi * (2 * n[: edge + 1] / (r * (w - 1)) - 1)))
        t[: edge + 1] = ramp
        t[w - edge - 1 :] = ramp[::-1]
        return jnp.asarray(t, dtype), jnp.asarray(t, dtype)
    raise ValueError(f"Unsupported OLA window: {wtype!r}")


@functools.partial(
    jax.jit,
    static_argnames=("p", "maxit", "method", "wtype", "w", "a", "max_gap"),
)
def segmentation_inpaint(
    signal: jnp.ndarray,
    mask: jnp.ndarray,
    gap_start: jnp.ndarray,
    gap_len: jnp.ndarray,
    p: int = 512,
    maxit: int = 10,
    method: str = "lpc",
    wtype: str = "hann",
    w: int = 4096,
    a: int = 1024,
    max_gap: int = 2048,
) -> jnp.ndarray:
    """Windowed-Janssen inpainting of one contiguous gap.

    Mirrors ``segmentation_inp(gapped, p, maxit, 'w', w, 'a', a, 'wtype',
    wtype)`` over the gap's neighborhood; the signal outside the touched
    windows is returned untouched.
    """
    n = signal.shape[-1]
    dtype = signal.dtype
    gana, gsyn = ola_windows(wtype, w, dtype)

    x = jnp.where(mask > 0, signal, 0.0)

    # Windows are centered on the shift grid: window k covers
    # [k*a - w//2, k*a + (w - w//2)). Static count K of windows that can
    # touch a gap of at most max_gap samples:
    K = (max_gap + w) // a + 2
    half = w // 2
    # First window index whose support can intersect the gap.
    k0 = (gap_start + half - w) // a + 1
    k0 = jnp.maximum(k0, -(half // a))

    pad = w + a * K + max_gap  # generous halo so all slices stay in range
    xp = jnp.pad(x, (pad, pad))
    mp = jnp.pad(mask, (pad, pad), constant_values=1.0)

    ks = k0 + jnp.arange(K)
    starts = ks * a - half + pad  # start index of each window in xp

    def gather(vec, s):
        return jax.lax.dynamic_slice(vec, (s,), (w,))

    seg_data = jax.vmap(lambda s: gather(xp, s))(starts) * gana  # (K, w)
    seg_mask = jax.vmap(lambda s: gather(mp, s))(starts)  # (K, w)

    # Per-segment contiguous missing run.
    miss = seg_mask <= 0
    any_miss = jnp.any(miss, axis=-1)
    run_start = jnp.argmax(miss, axis=-1)
    run_len = jnp.sum(miss, axis=-1)

    solved = jax.vmap(
        lambda d, m, s, l: janssen(
            d, m, s, l, p=p, maxit=maxit, method=method, max_gap=max_gap
        )
    )(seg_data, seg_mask, run_start, run_len)
    solved = jnp.where(any_miss[:, None], solved, seg_data)

    # Local OLA update.  Full OLA: out = sum_k gsyn * seg_k / rescale with
    # rescale = sum_k gana * gsyn (segmentation_inp.m:129-148).  Untouched
    # windows contribute gana*gsyn*x, so the update is local:
    #   out = x + sum_{k in K} gsyn * (solved_k - gana * x_k) / rescale
    num = jnp.zeros_like(xp)

    def accumulate(num, inputs):
        s, sol, dat = inputs
        contrib = gsyn * (sol - dat)
        num = jax.lax.dynamic_update_slice(num, gather(num, s) + contrib, (s,))
        return num, None

    num, _ = jax.lax.scan(accumulate, num, (starts, solved, seg_data), length=K)

    # The window grid has shift a, so sum_k (gana*gsyn)(i - k*a) is periodic
    # with period a: build one period and phase-align it to the grid.
    taps = -(-w // a)  # windows overlapping any point
    gg = jnp.pad(gana * gsyn, (0, taps * a - w)).reshape(taps, a)
    profile = jnp.sum(gg, axis=0)  # (a,)
    phase = (jnp.arange(xp.shape[0]) - starts[0]) % a
    power = profile[phase]
    power = jnp.where(power > 0, power, 1.0)

    out = xp + num / power
    return out[pad : pad + n]
