"""Training machinery for the time-domain gap-refinement head
(``models/refiner.WaveRefiner``).

The head consumes three deployable (no-oracle) gap solutions -- the
impaired waveform, the AR extrapolation fill, and the GAN reconstruction
under extrapolated phase -- and outputs a corrected gap waveform.  Every
training step builds its supervision pairs ON DEVICE in one fused program:
corrupt a corpus batch with a random gap, run the frozen GAN + AR solvers,
crop the window, and take the head's gradient.  The loss is per-clip
``log(gap error energy / gap reference energy)`` -- i.e. the NEGATIVE of
mean gap-SDR (up to 10/ln10), the exact deployable benchmark objective
(``model_eval.m:60``).

The head starts as the identity on the AR fill (zero-init final conv), so
step 0 reproduces the deployable-SDR baseline (+2.55 dB on the eval set)
and training is a monotone-improvement search from there (probe-selected,
same early-stop recipe as the GAN: ``cli/train.py --probe-every``).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ml_audio_inpainting_tpu.classical.arinpaint import arinpaint
from ml_audio_inpainting_tpu.models.refiner import WaveRefiner
from ml_audio_inpainting_tpu.ops.gaps import gap_mask
from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
from ml_audio_inpainting_tpu.utils.config import Config

__all__ = [
    "WINDOW",
    "MAX_GAP",
    "create_refiner_state",
    "make_example_fn",
    "make_refiner_train_step",
    "make_refiner_probe_fn",
    "make_refiner_apply_fn",
]

#: window around the gap fed to the head (1024 context samples per side)
WINDOW = 4096
#: static gap-length bound inside the window (128 ms at 16 kHz)
MAX_GAP = 2048


class RefinerState(train_state.TrainState):
    pass


def create_refiner_state(
    rng: jax.Array, lr: float = 3e-4, channels: int = 64
) -> RefinerState:
    model = WaveRefiner(channels=channels)
    z = jnp.zeros((1, WINDOW))
    variables = model.init(rng, z, z, z, z)
    tx = optax.adam(lr)
    return RefinerState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def make_example_fn(
    cfg: Config,
    gan_model,
    gan_variables,
    ar_order: int = 512,
    ar_context: int = 4096,
) -> Callable:
    """Jitted ``(audio (B,S), gap_start, gap_len) -> window dict``.

    Produces the head's input channels plus the clean target, all cropped
    to the ``WINDOW`` around the gap.  The neural channel is the full
    deployable GAN path (enhanced mode, extrapolated phase) -- the same
    graph ``cli/evaluate --phase extrapolate`` serves.
    """
    inpaint_fn = make_gan_inpaint_fn(
        cfg, gan_model, mode="enhanced", phase="extrapolate"
    )
    ar_fn = jax.vmap(
        lambda x, m, s, l: arinpaint(
            x, m, s, l, order=ar_order, context=ar_context, max_gap=MAX_GAP
        )
    )

    @jax.jit
    def examples(audio, gap_start, gap_len):
        B, S = audio.shape
        tmask = jax.vmap(lambda s, l: gap_mask(S, s, l, dtype=audio.dtype))(
            gap_start, gap_len
        )
        impaired = audio * tmask
        neural = inpaint_fn(gan_variables, audio, gap_start, gap_len)[0]
        fill = ar_fn(impaired, tmask, gap_start, gap_len)
        # An f32 LPC fit on a near-silent context can be numerically
        # unstable and the extrapolation overflows (random TRAINING gaps
        # land in pauses; the fixed eval condition rarely does).  Waveforms
        # live in [-1, 1]: sanitize both solver channels so one blown fill
        # cannot NaN the step.
        fill = jnp.clip(jnp.nan_to_num(fill), -4.0, 4.0)
        neural = jnp.clip(jnp.nan_to_num(neural), -4.0, 4.0)

        from ml_audio_inpainting_tpu.models.refiner import window_bounds

        start, off = window_bounds(gap_start, gap_len, WINDOW, MAX_GAP, S)

        def crop(x, st):
            return jax.lax.dynamic_slice(x, (st,), (WINDOW,))

        crop_b = jax.vmap(crop)
        idx = jnp.arange(WINDOW)
        gap_ind = (
            (idx[None, :] >= off[:, None])
            & (idx[None, :] < (off + gap_len)[:, None])
        ).astype(audio.dtype)
        return {
            "impaired": crop_b(impaired, start),
            "ar": crop_b(fill, start),
            "neural": crop_b(neural, start),
            "gap_ind": gap_ind,
            "clean": crop_b(audio, start),
            "start": start,
        }

    return examples


def _gap_loss(out, clean, gap_ind, energy_gate: bool = False):
    """Per-clip log error-to-reference energy ratio over the gap: the
    negative of gap-SDR up to a 10/ln10 factor.

    With ``energy_gate`` each clip's term is weighted by
    ``ref / (ref + median(ref))`` -- a soft gate that mutes near-silent
    gaps, whose err/ref ratio is epsilon noise and (measured, round 3)
    drowns the learnable signal: the ungated recipe's probe never moved
    more than 0.01 dB off the AR baseline."""
    err = jnp.sum((out - clean) ** 2 * gap_ind, axis=-1)
    ref = jnp.sum(clean**2 * gap_ind, axis=-1)
    li = jnp.log((err + 1e-9) / (ref + 1e-9))
    if not energy_gate:
        return jnp.mean(li)
    w = ref / (ref + jnp.median(ref) + 1e-12)
    return jnp.sum(w * li) / (jnp.sum(w) + 1e-12)


def make_refiner_train_step(
    cfg: Config,
    gan_model,
    gan_variables,
    gap_len_range: Tuple[float, float] = (0.04, 0.128),
    energy_cands: int = 8,
    delta_penalty: float = 0.0,
) -> Callable:
    """Fused corrupt -> solve -> refine -> grad step.

    ``gap_len_range`` in seconds (upper bound clamps to ``MAX_GAP``).

    ``delta_penalty`` adds ``lambda * E[gap delta energy / gap reference
    energy]`` -- an explicit bias toward the AR baseline.  The head's raw
    objective is minimized on the synthetic corpus; out of domain the
    learned correction can overshoot (measured: +1.3 dB in-domain gain,
    -1.5 dB on the real eval clips), and shrinking the correction bounds
    that regression at the cost of in-domain gain.

    Gap placement draws ``energy_cands`` candidate starts per clip and
    keeps the one with the highest clean energy inside the gap -- random
    gaps on the formant corpus land in pauses often enough that the
    (scale-invariant) loss is dominated by silence (measured, round 3:
    the uniform-placement recipe's probe never left the AR baseline).
    Voiced placement also matches the eval contract, whose t=2.0 s gap
    sits in running speech.  ``energy_cands=1`` restores uniform
    placement."""
    examples = make_example_fn(cfg, gan_model, gan_variables)
    sr = cfg.data.sample_rate
    lo = int(gap_len_range[0] * sr)
    hi = min(int(gap_len_range[1] * sr), MAX_GAP)
    margin = 8192  # keep the AR context inside the clip
    K = max(int(energy_cands), 1)

    @jax.jit
    def step(state: RefinerState, audio: jnp.ndarray, key: jax.Array):
        B, S = audio.shape
        k1, k2 = jax.random.split(key)
        gl = jax.random.randint(k1, (B,), lo, hi + 1)
        cands = jax.random.randint(k2, (B, K), margin, S - margin - hi)
        # pick the candidate with max clean gap energy (cumsum lookup)
        csum = jnp.cumsum(audio**2, axis=-1)  # (B, S)
        e_hi = jnp.take_along_axis(csum, cands + gl[:, None], axis=-1)
        e_lo = jnp.take_along_axis(csum, cands, axis=-1)
        gs = jnp.take_along_axis(
            cands, jnp.argmax(e_hi - e_lo, axis=-1)[:, None], axis=-1
        )[:, 0]
        ex = examples(audio, gs, gl)

        def loss_fn(params):
            out = state.apply_fn(
                {"params": params},
                ex["impaired"], ex["ar"], ex["neural"], ex["gap_ind"],
            )
            loss = _gap_loss(out, ex["clean"], ex["gap_ind"], energy_gate=True)
            if delta_penalty > 0.0:
                d2 = jnp.sum((out - ex["ar"]) ** 2 * ex["gap_ind"], axis=-1)
                ref = jnp.sum(ex["clean"] ** 2 * ex["gap_ind"], axis=-1)
                loss = loss + delta_penalty * jnp.mean(d2 / (ref + 1e-9))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        # baseline: the AR fill's own loss, for live improvement tracking
        base = _gap_loss(ex["ar"], ex["clean"], ex["gap_ind"], energy_gate=True)
        return state, {"loss": loss, "ar_baseline": base}

    return step


def make_refiner_probe_fn(cfg: Config, gan_model, gan_variables) -> Callable:
    """Held-out probe under the EVAL contract (80 ms gaps): returns
    (refined mean gap-SDR, AR-fill mean gap-SDR) in dB.

    ``probe(state, clips)`` places one gap at t=2.0 s per clip (the eval
    contract); ``probe(state, clips, gap_starts)`` takes explicit per-clip
    start samples -- used by the real-clip probe set, where each clip is
    replicated at several positions so 3 clips give 3xK measurements."""
    examples = make_example_fn(cfg, gan_model, gan_variables)
    sr = cfg.data.sample_rate

    @jax.jit
    def probe(state: RefinerState, clips: jnp.ndarray, gap_starts=None):
        B = clips.shape[0]
        if gap_starts is None:
            gs = jnp.full((B,), int(2.0 * sr), jnp.int32)
        else:
            gs = jnp.asarray(gap_starts, jnp.int32)
        gl = jnp.full((B,), int(0.08 * sr), jnp.int32)
        ex = examples(clips, gs, gl)
        out = state.apply_fn(
            {"params": state.params},
            ex["impaired"], ex["ar"], ex["neural"], ex["gap_ind"],
        )

        def sdr(x):
            err = jnp.sum((x - ex["clean"]) ** 2 * ex["gap_ind"], axis=-1)
            ref = jnp.sum(ex["clean"] ** 2 * ex["gap_ind"], axis=-1)
            return jnp.mean(10.0 * jnp.log10(ref / (err + 1e-12)))

        return sdr(out), sdr(ex["ar"])

    return probe


def refiner_channels(refiner_variables) -> int:
    """Infer the head width from exported variables (first conv kernel)."""
    return int(refiner_variables["params"]["Conv_0"]["kernel"].shape[-1])


def make_refiner_apply_fn(
    cfg: Config, gan_model, gan_variables, channels: int = 64
) -> Callable:
    """Full-signal deployable inference: ``fn(refiner_variables, audio,
    gap_start, gap_len) -> restored (B, S)`` -- the window is refined and
    composited back; observed samples pass through exactly."""
    examples = make_example_fn(cfg, gan_model, gan_variables)
    model = WaveRefiner(channels=channels)

    @jax.jit
    def fn(refiner_variables, audio, gap_start, gap_len):
        B, S = audio.shape
        ex = examples(audio, gap_start, gap_len)
        out = model.apply(
            refiner_variables,
            ex["impaired"], ex["ar"], ex["neural"], ex["gap_ind"],
        )

        def paste(sig, win, st):
            return jax.lax.dynamic_update_slice(sig, win, (st,))

        tmask = jax.vmap(
            lambda s, l: gap_mask(S, s, l, dtype=audio.dtype)
        )(gap_start, gap_len)
        pasted = jax.vmap(paste)(audio * tmask, out, ex["start"])
        return audio * tmask + pasted * (1.0 - tmask)

    return fn
