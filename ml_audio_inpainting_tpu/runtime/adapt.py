"""Per-clip test-time adaptation: fine-tune the generator on the clip itself.

The honest-regime neural numbers are domain-gap limited: the shipped
checkpoints never saw real speech (formant-synthesis corpus only), and the
corpus studies (results/README.md: v3 null, 4k-clip null) show the gap is
QUALITY, not size.  But at serving time we hold, for free, several seconds of
*real* audio from the very distribution we must inpaint -- the impaired clip's
own clean context.  This module adapts the generator to it:

1. Fill the real gap with the deployable AR solver (``classical/arinpaint``)
   so the training target is defined everywhere -- inside the real gap the
   target is the AR fill (+2.5 dB-class), outside it the true samples.
2. Fine-tune the generator for a few hundred steps on synthetic gaps drawn
   over this pseudo-clean clip (the training corruption recipe), G-only:
   L1 valid/hole + magnitude-weighted losses, no adversarial term (no D in
   the exported checkpoints, and a single-clip adversary is unstable).
3. An in-clip probe guards the whole procedure: synthetic probe gaps at
   fixed positions AWAY from the real gap are scored against the clip's own
   (known) samples every ``probe_every`` steps, and the best-scoring params
   -- including step 0, i.e. no adaptation -- are the ones served.

Everything consumed is derived from the impaired waveform and the gap
location: no oracle. The real gap's lost samples never appear in any input,
target, or probe.

No reference counterpart: ``model_eval.py:48-195`` serves fixed weights.
This is the "internal learning" idea (Deep-Image-Prior / ZSSR family) applied
to audio inpainting.

MEASURED RESULT (results/gan_tta_adapt_eval.json, TPU, 9 eval clips): a
gap-SDR NEGATIVE -- +3.51 dB adapted vs +4.42 unadapted.  The in-clip probe
is not a faithful proxy: it rises monotonically (2.6-7.5 dB) as the
generator memorizes the clip's own context, so the gate admits every
adapted candidate while the real-gap answer degrades 0.9 dB.  LSD and ODG
improve (1.10 vs 1.36 / -1.23 vs -1.44): adaptation trades waveform
accuracy inside the gap for spectral-envelope fit to the clip.  Default is
``--adapt-steps 0``; use only for perceptual-metric-first deployments.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ml_audio_inpainting_tpu.classical.arinpaint import arinpaint
from ml_audio_inpainting_tpu.ops import gaps as gap_ops
from ml_audio_inpainting_tpu.train import features
from ml_audio_inpainting_tpu.train.losses import generator_losses
from ml_audio_inpainting_tpu.train.metrics import gap_sdr
from ml_audio_inpainting_tpu.utils.config import Config

__all__ = [
    "make_gan_adapt_step",
    "probe_positions_for",
    "GanClipAdapter",
    "adapt_gan_variables",
]


def make_gan_adapt_step(
    cfg: Config,
    generator,
    lr: float = 5e-5,
    n_gaps: int = 4,
) -> Tuple[Callable, Callable]:
    """Build the G-only fine-tuning step for test-time adaptation.

    Same feature pipeline and reconstruction losses as the full trainer
    (``train/gan_trainer.py``) minus the adversarial and VGG terms: the
    exported serving checkpoints carry no discriminator, and on a single
    clip the L1/mag-weighted terms are the magnitude-accuracy signal we
    want (the refinement study showed in-gap magnitude accuracy is the
    binding constraint on deployable SDR).

    Returns ``(init_fn, step_fn)``::

        opt_state = init_fn(params)
        (params, batch_stats, opt_state), losses = step_fn(
            params, batch_stats, opt_state, audio_batch, key)
    """
    t = cfg.training
    lambdas = {
        "lambda_adv": 0.0,
        "lambda_l1_valid": t.lambda_l1_valid,
        "lambda_l1_hole": t.lambda_l1_hole,
        "lambda_mag_weighted": t.lambda_mag_weighted,
        "lambda_vgg_perceptual": 0.0,
        "lambda_vgg_style": 0.0,
    }
    tx = optax.adam(lr, b1=t.b1, b2=t.b2)

    def feat(audio, key):
        return features.gan_features(
            audio,
            key,
            cfg.data.spectrogram,
            gap_len_s=cfg.data.gap_len_s,
            sample_rate=cfg.data.sample_rate,
            n_samples=audio.shape[-1],
            n_gaps=n_gaps,
        )

    @jax.jit
    def step(params, batch_stats, opt_state, audio, key):
        batch = feat(audio, key)
        orig = batch["original_magnitude"]
        impaired = batch["impaired_magnitude"]
        mask = batch["mask"]

        def loss_fn(p):
            fake, upd = generator.apply(
                {"params": p, "batch_stats": batch_stats},
                impaired,
                mask,
                train=True,
                mutable=["batch_stats"],
            )
            losses = generator_losses(
                fake, orig, mask,
                jnp.zeros((fake.shape[0], 1, 1, 1)),  # no adversary
                lambdas,
            )
            return losses["g_total"], (upd, losses)

        (_, (upd, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, upd["batch_stats"], opt_state), losses

    return tx.init, step


def probe_positions_for(
    n_samples: int,
    gap_start: int,
    gap_len: int,
    sample_rate: int,
    n_probes: int = 4,
    margin_s: float = 0.35,
    edge_s: float = 0.6,
) -> np.ndarray:
    """Probe-gap start samples: spread over the clip, excluding the real gap
    ± ``margin_s`` (so no probe target or analysis window derives from the
    lost samples) and the clip edges (AR/STFT context)."""
    margin = int(margin_s * sample_rate)
    edge = int(edge_s * sample_rate)
    lo, hi = edge, n_samples - edge - gap_len
    grid = np.linspace(lo, hi, num=max(4 * n_probes, 16)).astype(np.int64)
    ok = (grid + gap_len < gap_start - margin) | (grid > gap_start + gap_len + margin)
    cand = grid[ok]
    if len(cand) == 0:
        raise ValueError("no probe positions clear of the real gap")
    pick = np.linspace(0, len(cand) - 1, num=min(n_probes, len(cand))).astype(int)
    return cand[pick]


class GanClipAdapter:
    """Reusable per-clip adapter: all jitted programs (AR fill, fine-tune
    step, probe) are built ONCE and shared across clips -- on TPU each trace
    costs minutes through the remote-compile tunnel, so a per-clip factory
    would recompile 3 programs x 9 clips."""

    def __init__(
        self,
        cfg: Config,
        generator,
        inpaint_fn: Callable,
        *,
        steps: int = 200,
        lr: float = 5e-5,
        batch: int = 8,
        probe_every: int = 25,
        n_probes: int = 4,
        n_gaps: int = 4,
        ar_order: int = 512,
        ar_context: int = 4096,
    ):
        self.cfg = cfg
        self.inpaint_fn = inpaint_fn
        self.steps = steps
        self.batch = batch
        self.probe_every = probe_every
        self.n_probes = n_probes
        self.ar_order = ar_order
        self.ar_context = ar_context
        self.init_fn, self.step_fn = make_gan_adapt_step(
            cfg, generator, lr=lr, n_gaps=n_gaps
        )
        self._ar_fill = jax.jit(
            lambda x, m, s, l, max_gap: arinpaint(
                x, m, s, l, order=ar_order, context=ar_context, max_gap=max_gap
            ),
            static_argnums=(4,),
        )

        @jax.jit
        def _probe(vars_, probe_audio, gs, gl, gapm):
            restored, _ = inpaint_fn(vars_, probe_audio, gs, gl)
            # Reduce to a scalar ON DEVICE (axon cannot materialize some
            # unbatched outputs, and a scalar fetch is cheap).
            return jnp.mean(gap_sdr(probe_audio, restored, gapm))

        self._probe = _probe

    def adapt(
        self,
        variables: Dict[str, Any],
        audio: jnp.ndarray,
        gap_start: int,
        gap_len: int,
        seed: int = 0,
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Adapt the generator to ONE clip; return (probe-best variables,
        info).

        ``audio``: ``(S,)`` waveform (the gap interval is zeroed internally
        -- the adaptation sees only deployable information).  The serving
        ``inpaint_fn`` is reused for the probe so checkpoint selection
        scores the exact serving path (mode/phase regime included).
        """
        cfg = self.cfg
        sr = cfg.data.sample_rate
        n_samples = int(audio.shape[-1])
        gap_start = int(gap_start)
        gap_len = int(gap_len)

        tmask = gap_ops.gap_mask(n_samples, gap_start, gap_len, dtype=audio.dtype)
        impaired = audio * tmask

        # Deployable target: AR fill inside the real gap, true samples
        # elsewhere.
        max_gap = 1 << (gap_len - 1).bit_length()
        pseudo_clean = self._ar_fill(
            impaired, tmask, jnp.asarray(gap_start), jnp.asarray(gap_len),
            max_gap,
        )

        # --- probe condition: synthetic gaps away from the real gap ---
        probe_starts = probe_positions_for(
            n_samples, gap_start, gap_len, sr, n_probes=self.n_probes
        )
        P = len(probe_starts)
        probe_audio = jnp.tile(pseudo_clean[None], (P, 1))
        gs = jnp.asarray(probe_starts, jnp.int32)
        gl = jnp.full((P,), gap_len, jnp.int32)
        probe_gapm = 1.0 - jax.vmap(
            lambda s, l: gap_ops.gap_mask(n_samples, s, l)
        )(gs, gl)

        def probe_score(vars_) -> float:
            return float(self._probe(vars_, probe_audio, gs, gl, probe_gapm))

        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        opt_state = self.init_fn(params)

        train_audio = jnp.tile(pseudo_clean[None], (self.batch, 1))
        key = jax.random.PRNGKey(seed)

        best = {"step": 0, "score": probe_score(variables)}
        best_vars = variables
        trajectory = [(0, best["score"])]
        for i in range(1, self.steps + 1):
            key, sub = jax.random.split(key)
            (params, batch_stats, opt_state), _ = self.step_fn(
                params, batch_stats, opt_state, train_audio, sub
            )
            if i % self.probe_every == 0 or i == self.steps:
                cand = {"params": params}
                if batch_stats is not None:
                    cand["batch_stats"] = batch_stats
                s = probe_score(cand)
                trajectory.append((i, s))
                if s > best["score"]:
                    best = {"step": i, "score": s}
                    best_vars = jax.tree_util.tree_map(jnp.array, cand)

        info = {
            "best_step": best["step"],
            "best_probe_sdr": round(best["score"], 3),
            "probe_trajectory": [(int(s), round(v, 3)) for s, v in trajectory],
            "probe_starts": [int(s) for s in probe_starts],
        }
        return best_vars, info


def adapt_gan_variables(
    cfg: Config,
    generator,
    variables: Dict[str, Any],
    inpaint_fn: Callable,
    audio: jnp.ndarray,
    gap_start: int,
    gap_len: int,
    *,
    steps: int = 200,
    lr: float = 5e-5,
    batch: int = 8,
    probe_every: int = 25,
    n_probes: int = 4,
    n_gaps: int = 4,
    seed: int = 0,
    ar_order: int = 512,
    ar_context: int = 4096,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """One-shot convenience wrapper around :class:`GanClipAdapter` (use the
    class directly when adapting several clips -- it compiles once)."""
    adapter = GanClipAdapter(
        cfg, generator, inpaint_fn,
        steps=steps, lr=lr, batch=batch, probe_every=probe_every,
        n_probes=n_probes, n_gaps=n_gaps,
        ar_order=ar_order, ar_context=ar_context,
    )
    return adapter.adapt(variables, audio, gap_start, gap_len, seed=seed)
