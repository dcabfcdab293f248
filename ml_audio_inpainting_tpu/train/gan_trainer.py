"""Adversarial training: D-step + G-step as one fused jitted program.

Reference driver: ``models/GAN/train.py:326-378`` -- per batch, (1) a
discriminator BCE step on real vs detached-fake, (2) a generator step on the
6-term objective.  Differences by design:

* Both optimizer updates run inside a single XLA program per batch, with
  feature extraction (gap sampling + STFT) fused in front (see
  ``train/features.py``).
* The reference's G-step reuses the fake spectrogram computed under
  ``torch.no_grad()`` (``train.py:349-350,368``), which silences all
  generator gradients -- a defect, not a contract.  Here the G-step
  re-runs the generator under autodiff, the standard (and intended)
  formulation.
* Spectral-norm power iterations and BatchNorm statistics are functional
  state threaded through the step (``batch_stats`` collections).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ml_audio_inpainting_tpu.models.discriminator import Discriminator
from ml_audio_inpainting_tpu.models.pconv_unet import PConvUNet
from ml_audio_inpainting_tpu.models.vgg import (
    VGG19Features,
    vgg19_params,
    vgg_perceptual_style_losses,
)
from ml_audio_inpainting_tpu.train import features
from ml_audio_inpainting_tpu.train.losses import discriminator_loss, generator_losses
from ml_audio_inpainting_tpu.utils.config import Config
from ml_audio_inpainting_tpu.utils.precision import cast_floating

__all__ = [
    "GANState",
    "build_generator",
    "build_discriminator",
    "create_gan_states",
    "make_gan_train_step",
    "make_gan_eval_step",
]


class GANState(train_state.TrainState):
    batch_stats: Any = None
    # Exponential moving average of the generator params (``--g-ema``).
    # None when disabled; the optimizer never sees it (serving-only weights).
    ema_params: Any = None


def build_generator(cfg: Config) -> PConvUNet:
    g = cfg.model.generator
    return PConvUNet(
        enc_layer_cfg=tuple(tuple(l) for l in g.enc_layer_cfg),
        dec_layer_cfg=tuple(tuple(l) for l in g.dec_layer_cfg),
        final_interim_ch=g.final_interim_ch,
        final_kernel=g.final_kernel,
        output_channels=g.output_channels,
    )


def build_discriminator(cfg: Config) -> Discriminator:
    d = cfg.model.discriminator
    return Discriminator(
        layer_cfg=tuple(tuple(l) for l in d.layer_cfg),
        kernel_size=d.kernel_size,
        use_spectral_norm=d.use_spectral_norm,
    )


def create_gan_states(
    cfg: Config, rng: jax.Array, g_ema: float = 0.0
) -> Tuple[GANState, GANState]:
    """Init G and D with their Adam optimizers (config.yaml:34-37:
    lr 2e-4, betas (0.5, 0.999)).

    ``g_ema`` > 0 seeds ``g_state.ema_params`` with a copy of the fresh
    params; :func:`make_gan_train_step` then maintains the moving average
    (no reference counterpart -- the reference serves the raw live
    weights, ``train.py:419-506``)."""
    spec = cfg.data.spectrogram
    F, T = spec.freq_bins, spec.frames(cfg.data.max_samples)
    g_rng, d_rng = jax.random.split(rng)

    gen = build_generator(cfg)
    dummy_x = jnp.zeros((1, F, T))
    dummy_m = jnp.ones((1, F, T))
    g_vars = gen.init(g_rng, dummy_x, dummy_m, train=False)
    t = cfg.training
    g_state = GANState.create(
        apply_fn=gen.apply,
        params=g_vars["params"],
        batch_stats=g_vars.get("batch_stats"),
        ema_params=(
            jax.tree_util.tree_map(jnp.array, g_vars["params"])
            if g_ema > 0 else None
        ),
        tx=optax.adam(t.g_lr, b1=t.b1, b2=t.b2),
    )

    disc = build_discriminator(cfg)
    d_vars = disc.init(d_rng, dummy_x, train=False)
    d_state = GANState.create(
        apply_fn=disc.apply,
        params=d_vars["params"],
        batch_stats=d_vars.get("batch_stats"),
        tx=optax.adam(t.d_lr, b1=t.b1, b2=t.b2),
    )
    return g_state, d_state


def _gan_feature_fn(cfg: Config):
    def fn(audio, key):
        return features.gan_features(
            audio,
            key,
            cfg.data.spectrogram,
            gap_len_s=cfg.data.gap_len_s,
            sample_rate=cfg.data.sample_rate,
            n_samples=cfg.data.max_samples,
            n_gaps=cfg.data.train_n_gaps,
        )

    return fn


def make_gan_train_step(
    cfg: Config,
    vgg: Optional[Tuple[VGG19Features, Any]] = None,
    compute_dtype=None,
    remat: bool = False,
    g_ema: float = 0.0,
    fused_g_forward: bool = False,
) -> Callable:
    """Build the fused two-optimizer step.

    ``fused_g_forward``: run the generator forward ONCE per step via
    ``jax.vjp`` and share it between the two updates — the detached
    ``fake`` for the D step and the pullback for the G gradients,
    mirroring the reference's reuse of one ``fake`` tensor
    (``models/GAN/train.py:341-378``).  **Measured NULL on TPU v5e**
    (B=32 bf16, ``results/gan_fused_g_forward_ab.json``): XLA already
    CSEs the written-twice forward — the pure detached forward's ops are
    a subset of the VJP forward's, so both variants compile to the SAME
    program (15.99 TFLOP, 12.04 GiB peak for each) and the interleaved
    A/B measures 3.612 vs 3.617 steps/s.  The default therefore stays the
    two-forward form (house rule: defaults unchanged on a measured null);
    the fused path remains as the recorded experiment with equivalence
    pinned by ``test_fused_g_forward_matches_legacy`` (same math, same
    PRNG stream, bitwise-identical D step, G grads differ only by FP
    reassociation).

    ``vgg``: ``(model, variables)`` from :func:`vgg19_params`; pass None to
    drop the VGG terms (reference behavior when both lambdas are 0,
    ``train.py:227-228``).

    ``compute_dtype``: optional mixed precision (``jnp.bfloat16``).  Master
    params and the Adam state stay f32; the G/D/VGG conv stacks — where the
    step's FLOPs and activation HBM live — run in ``compute_dtype`` by
    casting params + network inputs inside the loss functions (the cast is
    differentiated, so gradients arrive f32).  Loss reductions stay f32:
    the D logits and generator output are cast back up before any loss
    math, and :func:`vgg_perceptual_style_losses` accumulates f32
    internally.  State precision: the generator's BatchNorm statistics are
    NOT cast — in train mode the forward uses batch statistics (stays
    ``compute_dtype``) while the running-average update then promotes to
    f32, so the EMA accumulates at full precision (a bf16 EMA with
    momentum 0.99 rounds its increment to zero once within ~20% of the
    mean and freezes).  The discriminator's spectral-norm power-iteration
    vectors ARE cast (power iteration is self-correcting, and an f32 sigma
    would promote ``kernel / sigma`` — and with it the whole D stack —
    back to f32).

    ``remat``: rematerialize (``jax.checkpoint``) each differentiated
    network forward — G, D-on-fake, and the VGG terms — so the backward
    pass recomputes activations instead of holding them in HBM.  Trades
    ~1 extra forward of FLOPs for the step's dominant activation memory;
    use it to fit batch sizes past the non-remat HBM spill point (B=32
    f32 spills single-chip without it).  Numerically identical to the
    plain step.  The detached G forward feeding the D step is left alone:
    it is under ``stop_gradient``, so no activations are retained there.

    ``g_ema``: decay of a generator-params exponential moving average
    (0 = off).  The EMA lives in ``g_state.ema_params`` (seeded by
    :func:`create_gan_states`), is updated on-device after the optimizer
    step (one param-sized elementwise blend -- negligible next to the
    conv stacks), and is always held/updated in f32 regardless of
    ``compute_dtype``.  Serving-only: the adversarial game still runs on
    the live weights.
    """
    feat = _gan_feature_fn(cfg)
    t = cfg.training
    lambdas = {
        "lambda_adv": t.lambda_adv,
        "lambda_l1_valid": t.lambda_l1_valid,
        "lambda_l1_hole": t.lambda_l1_hole,
        "lambda_mag_weighted": t.lambda_mag_weighted,
        "lambda_vgg_perceptual": t.lambda_vgg_perceptual,
        "lambda_vgg_style": t.lambda_vgg_style,
    }
    use_vgg = vgg is not None and (t.lambda_vgg_perceptual > 0 or t.lambda_vgg_style > 0)
    if use_vgg:
        vgg_model, vgg_vars = vgg
        if compute_dtype is not None:
            vgg_vars = cast_floating(vgg_vars, compute_dtype)

    cast = (
        (lambda tr: cast_floating(tr, compute_dtype))
        if compute_dtype is not None
        else (lambda tr: tr)
    )
    restore = (
        (lambda tr: cast_floating(tr, jnp.float32))
        if compute_dtype is not None
        else (lambda tr: tr)
    )

    @jax.jit
    def step(g_state: GANState, d_state: GANState, audio: jnp.ndarray, key: jax.Array):
        batch = feat(audio, key)
        orig = batch["original_magnitude"]
        impaired = batch["impaired_magnitude"]
        mask = batch["mask"]
        orig_c, impaired_c, mask_c = cast(orig), cast(impaired), cast(mask)

        # G forward (train=True, mutable batch stats; the stats are
        # deliberately NOT cast — see docstring: f32 EMA).  Defined up here
        # because the fused path shares ONE forward between both updates.
        def g_apply(g_params, x, m):
            return g_state.apply_fn(
                {"params": cast(g_params), "batch_stats": g_state.batch_stats},
                x,
                m,
                train=True,
                mutable=["batch_stats"],
            )

        if remat:
            g_apply = jax.checkpoint(g_apply)

        # --- Discriminator step (train.py:347-363) ---
        if fused_g_forward:
            fake, g_vjp, g_upd = jax.vjp(
                lambda p: g_apply(p, impaired_c, mask_c),
                g_state.params,
                has_aux=True,
            )
            fake_detached = jax.lax.stop_gradient(fake)
        else:
            fake_detached, _ = g_apply(g_state.params, impaired_c, mask_c)
            fake_detached = jax.lax.stop_gradient(fake_detached)

        def d_train_apply(d_params, bstats, x):
            return d_state.apply_fn(
                {"params": cast(d_params), "batch_stats": bstats},
                x,
                train=True,
                mutable=["batch_stats"],
            )

        if remat:
            d_train_apply = jax.checkpoint(d_train_apply)

        def d_loss_fn(d_params):
            d_real, upd1 = d_train_apply(
                d_params, cast(d_state.batch_stats), orig_c
            )
            d_fake, upd2 = d_train_apply(
                d_params, upd1["batch_stats"], fake_detached
            )
            losses = discriminator_loss(
                d_real.astype(jnp.float32), d_fake.astype(jnp.float32)
            )
            return losses["d_total"], (upd2, losses)

        (d_total, (d_upd, d_losses)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)
        d_state = d_state.replace(batch_stats=restore(d_upd["batch_stats"]))

        # --- Generator step (train.py:365-378, with the no_grad defect fixed) ---
        def d_infer(x):
            return d_state.apply_fn(
                {"params": cast(d_state.params), "batch_stats": cast(d_state.batch_stats)},
                x,
                train=False,
            )

        def vgg_terms(fake, target):
            return vgg_perceptual_style_losses(vgg_model, vgg_vars, fake, target)

        if remat:
            d_infer = jax.checkpoint(d_infer)
            vgg_terms = jax.checkpoint(vgg_terms)

        def losses_from_fake(fake):
            d_fake_logits = d_infer(fake)
            vgg_losses = vgg_terms(fake, orig_c) if use_vgg else None
            losses = generator_losses(
                fake.astype(jnp.float32),
                orig,
                mask,
                d_fake_logits.astype(jnp.float32),
                lambdas,
                vgg_losses,
            )
            return losses["g_total"], losses

        if fused_g_forward:
            # Chain the loss gradient through the saved forward's pullback.
            (g_total, g_losses), fake_bar = jax.value_and_grad(
                losses_from_fake, has_aux=True
            )(fake)
            (g_grads,) = g_vjp(fake_bar)
        else:
            def g_loss_fn(g_params):
                fake2, g_upd2 = g_apply(g_params, impaired_c, mask_c)
                total, losses = losses_from_fake(fake2)
                return total, (g_upd2, losses)

            (g_total, (g_upd, g_losses)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_state.params)
        g_state = g_state.apply_gradients(grads=g_grads)
        g_state = g_state.replace(batch_stats=restore(g_upd["batch_stats"]))
        if g_ema > 0 and g_state.ema_params is not None:
            g_state = g_state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: g_ema * e + (1.0 - g_ema) * p,
                    g_state.ema_params,
                    g_state.params,
                )
            )

        metrics = {**{k: v for k, v in g_losses.items()}, **d_losses}
        return g_state, d_state, metrics

    return step


def make_gan_eval_step(cfg: Config, vgg=None) -> Callable:
    """Validation pass: same losses, no updates (``train.py:530-599``)."""
    feat = _gan_feature_fn(cfg)
    t = cfg.training
    lambdas = {
        "lambda_adv": t.lambda_adv,
        "lambda_l1_valid": t.lambda_l1_valid,
        "lambda_l1_hole": t.lambda_l1_hole,
        "lambda_mag_weighted": t.lambda_mag_weighted,
        "lambda_vgg_perceptual": t.lambda_vgg_perceptual,
        "lambda_vgg_style": t.lambda_vgg_style,
    }
    use_vgg = vgg is not None and (t.lambda_vgg_perceptual > 0 or t.lambda_vgg_style > 0)
    if use_vgg:
        vgg_model, vgg_vars = vgg

    @jax.jit
    def step(g_state: GANState, d_state: GANState, audio: jnp.ndarray, key: jax.Array):
        batch = feat(audio, key)
        orig, impaired, mask = (
            batch["original_magnitude"],
            batch["impaired_magnitude"],
            batch["mask"],
        )
        fake = g_state.apply_fn(
            {"params": g_state.params, "batch_stats": g_state.batch_stats},
            impaired,
            mask,
            train=False,
        )
        d_fake = d_state.apply_fn(
            {"params": d_state.params, "batch_stats": d_state.batch_stats},
            fake,
            train=False,
        )
        d_real = d_state.apply_fn(
            {"params": d_state.params, "batch_stats": d_state.batch_stats},
            orig,
            train=False,
        )
        vgg_losses = (
            vgg_perceptual_style_losses(vgg_model, vgg_vars, fake, orig)
            if use_vgg
            else None
        )
        g_losses = generator_losses(fake, orig, mask, d_fake, lambdas, vgg_losses)
        d_losses = discriminator_loss(d_real, d_fake)
        return {**g_losses, **d_losses}

    return step
