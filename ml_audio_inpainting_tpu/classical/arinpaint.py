"""Forward/backward LPC extrapolation with cos^2 crossfade.

Reference: ``models/AudioReg/utils/arinpaint.m`` -- fit AR models on the
mean-removed pre-gap and (flipped) post-gap context, extrapolate both into
the gap with an all-pole filter seeded from the last ``order`` context
samples, and blend with ``cos(t)^2`` weights.

The all-pole ``filter(1, a, 0-input, filtic(...))`` of MATLAB reduces to the
pure AR recursion ``y[n] = -sum_j a[j] y[n-j]`` seeded with the context
tail; here that is a ``lax.scan`` carrying the last ``order`` samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ml_audio_inpainting_tpu.ops.linalg import arburg, lpc

__all__ = ["ar_extrapolate", "arinpaint"]


@functools.partial(jax.jit, static_argnames=("order", "steps"))
def ar_extrapolate(coef: jnp.ndarray, context_tail: jnp.ndarray, order: int, steps: int) -> jnp.ndarray:
    """Continue a signal ``steps`` samples past its end via AR recursion.

    ``coef``: ``[1, a1..ap]``.  ``context_tail``: last ``order`` samples
    (mean-removed).  Returns the ``steps`` extrapolated samples.
    """
    a = coef[1:]  # a1..ap

    def step(carry, _):
        # carry: last `order` samples, newest last
        y = -jnp.sum(a * carry[::-1])
        carry = jnp.concatenate([carry[1:], y[None]])
        return carry, y

    _, ys = jax.lax.scan(step, context_tail, None, length=steps)
    return ys


@functools.partial(
    jax.jit,
    static_argnames=("order", "context", "max_gap", "method", "blend", "blend_param"),
)
def arinpaint(
    signal: jnp.ndarray,
    mask: jnp.ndarray,
    gap_start: jnp.ndarray,
    gap_len: jnp.ndarray,
    order: int = 512,
    context: int = 4096,
    max_gap: int = 2048,
    method: str = "lpc",
    blend: str = "cos2",
    blend_param: float = 0.0,
) -> jnp.ndarray:
    """Fill one contiguous gap by bidirectional AR extrapolation.

    ``context`` is the reference's ``maxlen`` (= the OLA window length ``w``
    in ``train.m:137``): how many samples on each side feed the AR fit.
    ``max_gap`` is the static bound on ``gap_len``.
    """
    n = signal.shape[-1]
    x = jnp.where(mask > 0, signal, 0.0)
    pad = max(context, order + 1)
    xp = jnp.pad(x, (pad, pad + max_gap))

    # Pre-gap context [gap_start - context, gap_start)
    pre = jax.lax.dynamic_slice(xp, (gap_start - context + pad,), (context,))
    premean = jnp.mean(pre)
    pre = pre - premean
    # Post-gap context [gap_end, gap_end + context), flipped for backward fit
    post = jax.lax.dynamic_slice(xp, (gap_start + gap_len + pad,), (context,))
    post = post[::-1]
    postmean = jnp.mean(post)
    post = post - postmean

    fit = lpc if method == "lpc" else arburg
    af = fit(pre, order)
    ab = fit(post, order)

    prediction = ar_extrapolate(af, pre[-order:], order, max_gap)
    postdiction = ar_extrapolate(ab, post[-order:], order, max_gap)
    # backward extrapolation runs reversed-time; re-flip to gap order, then
    # align so its first max_gap..? The flip must map extrapolation step k
    # (closest to the post-gap edge) to gap position gap_len-1-k.
    idx = jnp.arange(max_gap)
    postdiction_aligned = postdiction[jnp.clip(gap_len - 1 - idx, 0, max_gap - 1)]

    # Forward-weight curve w(t) over the actual gap length.  "cos2" is the
    # reference's crossfade (arinpaint.m:46-50).  The alternatives keep BOTH
    # predictions mixed throughout the gap (w never reaches 0/1): the fwd and
    # bwd extrapolations are independent estimates of the same lost segment,
    # and partial ensemble-averaging reduces error variance -- measured on
    # the real-clip probe set (never the eval clips), a gentle ramp beats
    # cos^2 by ~0.1 dB probe / +0.16 dB eval (results/ar_blend_sweep.json).
    #   "linear":  w = c + (1-2c)(1-t), floor c = blend_param (0 = plain ramp)
    #   "sigmoid": w = 1/(1+exp(k(t-1/2))), steepness k = blend_param
    t = jnp.clip(idx / jnp.maximum(gap_len - 1, 1), 0.0, 1.0)
    if blend == "cos2":
        w = jnp.cos(t * (jnp.pi / 2)) ** 2
    elif blend == "linear":
        c = float(blend_param)
        w = c + (1.0 - 2.0 * c) * (1.0 - t)
    elif blend == "sigmoid":
        k = float(blend_param) if blend_param else 2.0
        w = jax.nn.sigmoid(-k * (t - 0.5))
    else:
        raise ValueError(f"unknown blend {blend!r}")
    fill = w * (prediction + premean) + (1.0 - w) * (postdiction_aligned + postmean)

    in_gap = idx < gap_len
    out = jax.lax.dynamic_update_slice(
        jnp.pad(x, (0, max_gap)),
        jnp.where(
            in_gap,
            fill,
            jax.lax.dynamic_slice(jnp.pad(x, (0, max_gap)), (gap_start,), (max_gap,)),
        ),
        (gap_start,),
    )[:n]
    return out
