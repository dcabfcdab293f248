"""CNN+BiLSTM training: fused feature-extraction + forward/backward step.

The reference trains this model with a host-side DataLoader and a per-batch
L1 step (``models/CNNBLSTM/train.py:78-121``).  Here one jitted function
takes raw waveforms and a PRNG key, samples gaps, computes both STFTs,
runs the model and the optimizer update -- a single XLA program per step
with no host DSP.  Data parallelism comes from sharding the waveform batch
over the mesh (see ``parallel/``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ml_audio_inpainting_tpu.models.cnn_blstm import StackedBLSTMCNN
from ml_audio_inpainting_tpu.train import features
from ml_audio_inpainting_tpu.train.losses import cnn_gap_l1_loss, cnn_phase_l1_loss
from ml_audio_inpainting_tpu.utils.config import Config
from ml_audio_inpainting_tpu.utils.precision import cast_floating

__all__ = [
    "CNNTrainState",
    "build_model",
    "create_cnn_state",
    "make_cnn_train_step",
    "make_cnn_eval_step",
]


class CNNTrainState(train_state.TrainState):
    batch_stats: Any = None
    # Exponential moving average of the params (``--ema``).  None when
    # disabled; serving-only weights — the optimizer never sees them.
    ema_params: Any = None


def build_model(cfg: Config) -> StackedBLSTMCNN:
    m = cfg.model.cnn_blstm
    return StackedBLSTMCNN(
        in_channels=m.in_channels,
        num_lstm_layers=m.num_lstm_layers,
        lstm_hidden_dim=m.lstm_hidden_dim,
        freq_bins=cfg.data.spectrogram.freq_bins,
        enc_filters=tuple(m.enc_filters),
        dec_filters=tuple(m.dec_filters),
        use_pallas_lstm=jax.default_backend() == "tpu",
    )


def create_cnn_state(cfg: Config, rng: jax.Array, ema: float = 0.0) -> CNNTrainState:
    """Initialize model params + Adam state (reference lr 1e-4,
    ``models/CNNBLSTM/train.py:72``).

    ``ema`` > 0 seeds ``ema_params`` with a copy of the fresh params;
    :func:`make_cnn_train_step` then maintains the moving average (no
    reference counterpart — the reference serves the raw live weights)."""
    model = build_model(cfg)
    spec = cfg.data.spectrogram
    shape = (1, spec.freq_bins, spec.frames(cfg.data.max_samples))
    if cfg.model.cnn_blstm.in_channels == 2:
        shape = shape + (2,)  # phase mode: stacked (real, imag) channels
    dummy = jnp.zeros(shape)
    variables = model.init(rng, dummy, train=False)
    lr = cfg.training.starter_learning_rate
    if cfg.training.lr_decay != 1.0:
        tx = optax.adam(optax.exponential_decay(lr, 1, cfg.training.lr_decay))
    else:
        tx = optax.adam(lr)
    return CNNTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        ema_params=(
            jax.tree_util.tree_map(jnp.array, variables["params"])
            if ema > 0 else None
        ),
        tx=tx,
    )


def _feature_fn(cfg: Config, phase_mode: bool = False, phase_anchor: bool = False):
    def fn(audio, key):
        if phase_mode:
            # Complex 2-channel pipeline (cnn_phase_features); single-gap
            # corruption only -- the reference's phase dataloader had no
            # multi-gap variant (old/dataloader_phase.py:88-97).
            # phase_anchor: anchor-rotated target (the round-5 fix for the
            # complex-L1 median collapse; see cnn_phase_features).
            return features.cnn_phase_features(
                audio,
                key,
                cfg.data.spectrogram,
                gap_len_s=cfg.data.gap_len_s,
                sample_rate=cfg.data.sample_rate,
                n_samples=cfg.data.max_samples,
                gaps_per_audio=cfg.data.gaps_per_audio,
                anchored=phase_anchor,
            )
        return features.cnn_features(
            audio,
            key,
            cfg.data.spectrogram,
            gap_len_s=cfg.data.gap_len_s,
            sample_rate=cfg.data.sample_rate,
            n_samples=cfg.data.max_samples,
            gaps_per_audio=cfg.data.gaps_per_audio,
            n_gaps=cfg.data.train_n_gaps,
        )

    return fn


def make_cnn_train_step(
    cfg: Config, ema: float = 0.0, compute_dtype=None, phase_mode: bool = False,
    phase_anchor: bool = False,
) -> Callable[[CNNTrainState, jnp.ndarray, jax.Array], Tuple[CNNTrainState, Dict]]:
    """Build the jitted train step: gaps -> STFTs -> forward -> L1 -> Adam.

    ``ema``: decay of a serving-side params moving average (0 = off);
    updated on-device after the optimizer step, same contract as the GAN
    trainer's ``g_ema`` (one param-sized elementwise blend per step).

    ``compute_dtype``: optional mixed precision (``jnp.bfloat16``), the GAN
    trainer's recipe applied to this family: master weights, Adam state and
    the loss stay f32; the network forward/backward (conv stacks + BiLSTM
    scan matmuls, where the FLOPs and activation HBM live) runs in
    ``compute_dtype`` by casting params + the network input inside the loss
    (cast VJPs return f32 cotangents, so the optimizer sees f32 grads).
    BatchNorm running statistics are NOT cast: the batch forward uses batch
    stats (stays ``compute_dtype``) while the running-average update then
    promotes to f32, so the EMA accumulates at full precision.

    ``phase_mode``: train the complex 2-channel pipeline (the reference's
    ``old/train_v2_phase.py:87-92`` recipe): stacked (real, imag) STFT
    channels in, complex L1 on the gap out.  Requires
    ``cfg.model.cnn_blstm.in_channels == 2``.  ``phase_anchor`` rotates the
    complex target by the deployable phase-vocoder anchor (see
    ``features.cnn_phase_features``) so the L1 regression is well-posed."""
    feat = _feature_fn(cfg, phase_mode=phase_mode, phase_anchor=phase_anchor)
    cast = (
        (lambda tr: cast_floating(tr, compute_dtype))
        if compute_dtype is not None
        else (lambda tr: tr)
    )

    @jax.jit
    def step(state: CNNTrainState, audio: jnp.ndarray, key: jax.Array):
        batch = feat(audio, key)
        net_in = batch["spec_gap"] if phase_mode else batch["log_gap"]

        def loss_fn(params):
            pred, updates = state.apply_fn(
                {"params": cast(params), "batch_stats": state.batch_stats},
                cast(net_in),
                train=True,
                mutable=["batch_stats"],
            )
            if phase_mode:
                loss = cnn_phase_l1_loss(
                    pred.astype(jnp.float32), batch["target"], batch["gap_mask"]
                )
            else:
                loss = cnn_gap_l1_loss(
                    pred.astype(jnp.float32), batch["target_mag"], batch["gap_mask"]
                )
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=updates["batch_stats"])
        if ema > 0 and state.ema_params is not None:
            new_state = new_state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: ema * e + (1.0 - ema) * p,
                    new_state.ema_params,
                    new_state.params,
                )
            )
        return new_state, {"loss": loss}

    return step


def make_cnn_eval_step(
    cfg: Config, phase_mode: bool = False, phase_anchor: bool = False
) -> Callable[[CNNTrainState, jnp.ndarray, jax.Array], Dict]:
    """Jitted validation step (``models/CNNBLSTM/train.py:128-150``)."""
    feat = _feature_fn(cfg, phase_mode=phase_mode, phase_anchor=phase_anchor)

    @jax.jit
    def step(state: CNNTrainState, audio: jnp.ndarray, key: jax.Array):
        batch = feat(audio, key)
        pred = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["spec_gap"] if phase_mode else batch["log_gap"],
            train=False,
        )
        if phase_mode:
            loss = cnn_phase_l1_loss(pred, batch["target"], batch["gap_mask"])
        else:
            loss = cnn_gap_l1_loss(pred, batch["target_mag"], batch["gap_mask"])
        return {"loss": loss}

    return step
