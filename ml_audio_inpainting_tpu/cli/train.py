"""Training CLI: ``mai-train --model {gan,cnn_blstm} --config cfg.yaml``.

Replaces the reference's per-model ``python train.py`` scripts
(``models/GAN/train.py``, ``models/CNNBLSTM/train.py``) with one driver:
config-driven like the reference (same YAML keys), but with explicit flags,
a device mesh, fused train steps, orbax checkpoints, and TensorBoard
logging.  ``--synthetic N`` trains on the deterministic synthetic corpus
when no LibriSpeech tree is available.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train an audio-inpainting model on TPU")
    p.add_argument("--model", choices=["gan", "cnn_blstm"], required=True)
    p.add_argument("--config", type=str, default=None, help="YAML config path")
    p.add_argument("--data-root", type=str, default=None, help="override data.root_path")
    p.add_argument("--synthetic", type=int, default=0, help="use N synthetic clips instead of files")
    p.add_argument("--corpus",
                   choices=["formant", "formant_v2", "formant_v3", "harmonic"],
                   default="formant",
                   help="synthetic corpus style: formant-synthesized pseudo-speech "
                        "(default), its richer v2 variant (nasals, diphthongs, "
                        "clusters, rate/breathiness variation), or the simple "
                        "harmonic stack")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--steps", type=int, default=None, help="hard cap on total steps")
    p.add_argument("--run-name", type=str, default=None)
    p.add_argument("--base-dir", type=str, default=".")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume-from", type=str, default=None,
                   help="orbax checkpoint dir of a PRIOR run to restore the "
                        "latest step from (run dirs are timestamped, so "
                        "--resume alone only sees the current run's dir); "
                        "training continues into this run's own dir. Pass "
                        "the same --ema/--train-dtype the prior run used so "
                        "the state template matches")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--valid-every", type=int, default=0,
                   help="run a validation pass every N steps (0 = off)")
    p.add_argument("--valid-batches", type=int, default=4)
    p.add_argument("--workers", type=int, default=4,
                   help="host decode threads (reference DataLoader num_workers=4)")
    p.add_argument("--feed", choices=["auto", "stream", "device"],
                   default="auto",
                   help="input pipeline: 'stream' decodes+uploads each batch "
                        "(bounded prefetch); 'device' uploads the WHOLE corpus "
                        "to HBM once and gathers batches on-device -- removes "
                        "the per-step host upload (the large-batch bottleneck "
                        "on a tunneled link; B=32 bf16 measured 4.2 vs 1.0 "
                        "steps/s streamed). Requires the corpus to fit HBM "
                        "(a 2000x5s clip corpus is 610 MiB). 'auto' (default) "
                        "picks 'device' when the corpus is <=2 GiB f32, else "
                        "'stream'. Epoch ordering is bit-identical across "
                        "feeds, so the choice is throughput-only.")
    p.add_argument("--train-n-gaps", type=int, default=None,
                   help="train with N spacing-constrained gaps per clip "
                        "(IRMAS-style) instead of the reference's single gap")
    p.add_argument("--train-gap-len", type=float, default=None,
                   help="override data.gap_len_s for the TRAINING corruption "
                        "(single-gap length, or the multi-gap max length): "
                        "the default 0.2 s recipe breaks down on 0.5 s eval "
                        "gaps -- train with 0.5 here for long-gap robustness")
    p.add_argument("--probe-every", type=int, default=0,
                   help="score a held-out gap-SDR probe every N steps and "
                        "keep the best checkpoint under checkpoints/best "
                        "(0 = off). This operationalizes the measured GAN "
                        "early-stopping recipe: adversarial quality peaks "
                        "then regresses with continued training.")
    p.add_argument("--probe-clips", type=int, default=8,
                   help="number of held-out clips in the probe batch")
    p.add_argument("--probe-dir", type=str, default=None,
                   help="directory of REAL held-out probe clips for "
                        "best-checkpoint selection (e.g. the reference's "
                        "shipped validation-split outputs -- disjoint from "
                        "the eval clips); overrides the synthetic probe "
                        "source. Each clip is probed at --probe-positions.")
    p.add_argument("--probe-positions", type=float, nargs="+", default=[2.0],
                   help="gap start times (s) per probe clip when "
                        "--probe-dir is set")
    p.add_argument("--probe-gap-len", type=float, default=0.08,
                   help="gap length (s) of the held-out probe condition "
                        "(default: the 80 ms eval spec; raise for long-gap "
                        "training variants so selection matches the target)")
    p.add_argument("--probe-patience", type=int, default=0,
                   help="stop after P consecutive probes without a new best "
                        "(0 = never stop early)")
    p.add_argument("--train-dtype", choices=["f32", "bf16"], default="f32",
                   help="GAN step compute precision: bf16 runs the G/D/VGG "
                        "conv stacks in bfloat16 with f32 master weights and "
                        "f32 loss reductions (mixed precision)")
    p.add_argument("--ema", "--g-ema", dest="ema", type=float, default=0.0,
                   help="serving-side params EMA decay (0 = off; try "
                        "0.999). The probe, best-checkpoint selection, and "
                        "the exported inference npz all use the EMA "
                        "weights; training (the adversarial game, for the "
                        "GAN) runs on the live weights")
    p.add_argument("--phase-mode", action="store_true",
                   help="cnn_blstm only: train the complex 2-channel "
                        "pipeline (stacked real/imag STFT channels in, "
                        "complex L1 on the gap out -- the reference's "
                        "old/train_v2_phase.py recipe). The model predicts "
                        "magnitude AND phase, so serving needs no phase "
                        "regime: it is deployable by construction "
                        "(runtime.inference.make_cnn_phase_inpaint_fn)")
    p.add_argument("--phase-anchor", action="store_true",
                   help="with --phase-mode: rotate the complex target by "
                        "the deployable phase-vocoder anchor "
                        "(ops/phase.extrapolate_phase) so complex L1 is "
                        "well-posed -- the round-5 fix for the measured "
                        "median collapse (results/cnn_phase_r5_eval.json); "
                        "serve the checkpoint with "
                        "make_cnn_phase_inpaint_fn(..., anchored=True) / "
                        "--models cnn_phase_anchored")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the GAN step's network forwards "
                        "(jax.checkpoint): backward recomputes activations "
                        "instead of holding them in HBM -- fits batches past "
                        "the spill point (f32 B=32 single-chip) at ~1 extra "
                        "forward of FLOPs; numerically identical")
    return p


def _synthetic_cls(args):
    import functools

    from ml_audio_inpainting_tpu.data.dataset import (
        FormantSpeechDataset,
        SyntheticSpeechDataset,
    )

    if args.corpus == "harmonic":
        return SyntheticSpeechDataset
    if args.corpus in ("formant_v2", "formant_v3"):
        variant = args.corpus.split("_")[1]
        return functools.partial(FormantSpeechDataset, variant=variant)
    return FormantSpeechDataset


def make_dataset(cfg, args):
    from ml_audio_inpainting_tpu.data.dataset import AudioFileDataset

    if args.synthetic:
        return _synthetic_cls(args)(
            n_items=args.synthetic,
            sample_rate=cfg.data.sample_rate,
            max_len_s=cfg.data.max_len_s,
        )
    root = Path(args.data_root or cfg.data.root_path) / cfg.data.train_path
    max_files = cfg.data.train_limit or cfg.data.n_files
    return AudioFileDataset(
        root,
        sample_rate=cfg.data.sample_rate,
        max_len_s=cfg.data.max_len_s,
        max_files=max_files,
    )


def main(argv=None) -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from ml_audio_inpainting_tpu.data.pipeline import batch_iterator, prefetch_to_device
    from ml_audio_inpainting_tpu.parallel.mesh import batch_sharding, make_mesh
    from ml_audio_inpainting_tpu.parallel.sharding import make_sharded_step, place_state
    from ml_audio_inpainting_tpu.train.checkpoints import CheckpointManager
    from ml_audio_inpainting_tpu.utils.config import Config, load_config
    from ml_audio_inpainting_tpu.utils.run_logging import RunContext

    args = build_argparser().parse_args(argv)
    if args.model != "gan" and args.remat:
        # Same fail-fast rationale: remat targets the GAN step's activation
        # HBM (conv U-Net + VGG stacks); the CNN step is scan-latency-bound
        # and does not spill at its production batch sizes.
        raise SystemExit("--remat is supported for --model gan only")
    if args.phase_mode and args.model != "cnn_blstm":
        raise SystemExit("--phase-mode is supported for --model cnn_blstm only")
    if args.phase_anchor and not args.phase_mode:
        raise SystemExit("--phase-anchor requires --phase-mode")
    cfg = load_config(args.config) if args.config else Config()
    if args.phase_mode:
        cfg.model.cnn_blstm.in_channels = 2
        if cfg.data.train_n_gaps > 1:
            raise SystemExit(
                "--phase-mode has no multi-gap training features "
                "(cnn_phase_features is single-gap, like the reference's "
                "phase dataloader)"
            )
    if args.epochs is not None:
        cfg.training.epochs = args.epochs
        cfg.training.max_n_epochs = args.epochs
    if args.batch_size is not None:
        cfg.training.batch_size = args.batch_size
    if args.train_n_gaps is not None:
        cfg.data.train_n_gaps = args.train_n_gaps
    if args.train_gap_len is not None:
        cfg.data.gap_len_s = args.train_gap_len

    run = RunContext(cfg, run_name=args.run_name, base_dir=args.base_dir)
    # Reproducibility: the config dump alone cannot reconstruct the run
    # (probe/corpus/dtype flags live outside the config tree).
    run.logger.info("argv: %s", " ".join(argv if argv is not None else sys.argv[1:]))
    # Data-parallel width must divide the batch; use the largest divisor of
    # the batch size that fits the available devices.
    import math

    avail = len(jax.devices()) // args.model_parallel
    dp = math.gcd(cfg.training.batch_size, avail)
    mesh = make_mesh(
        data_parallel=dp,
        model_parallel=args.model_parallel,
        devices=jax.devices()[: dp * args.model_parallel],
    )
    run.logger.info("mesh: %s over %d devices", dict(mesh.shape), len(jax.devices()))

    dataset = make_dataset(cfg, args)
    run.logger.info("dataset: %d items", len(dataset))

    # Validation source (train.py:530-599): the valid split when configured,
    # else a held-out synthetic set.
    valid_dataset = None
    if args.valid_every:
        if args.synthetic:
            valid_dataset = _synthetic_cls(args)(
                n_items=args.valid_batches * cfg.training.batch_size,
                sample_rate=cfg.data.sample_rate,
                max_len_s=cfg.data.max_len_s,
                seed=999,
            )
        else:
            from ml_audio_inpainting_tpu.data.dataset import AudioFileDataset

            vroot = Path(args.data_root or cfg.data.root_path) / cfg.data.valid_path
            if vroot.exists():
                valid_dataset = AudioFileDataset(
                    vroot,
                    sample_rate=cfg.data.sample_rate,
                    max_len_s=cfg.data.max_len_s,
                    max_files=args.valid_batches * cfg.training.batch_size,
                )

    def run_validation(eval_fn, states, step, key):
        if valid_dataset is None:
            return
        vals = []
        for vb in batch_iterator(
            valid_dataset, cfg.training.batch_size, shuffle=False, epochs=1
        ):
            out = eval_fn(*states, jnp.asarray(vb), key)
            vals.append({k: float(v) for k, v in out.items()})
        if vals:
            for k in vals[0]:
                avg = float(np.mean([v[k] for v in vals]))
                run.scalar(f"Loss_Valid/{k}", avg, step)
            run.logger.info(
                "validation @ step %d: %s",
                step,
                {k: round(float(np.mean([v[k] for v in vals])), 4) for k in vals[0]},
            )
    # Held-out quality probe + best-checkpoint tracking (--probe-every).
    # The gap condition matches the evaluation contract: one 80 ms gap at
    # t = 2.0 s (model_eval.py:64-70).  Selection is on gap-SDR; PSM is
    # logged alongside.  Probe clips never overlap the training set
    # (held-out synthetic seed, or the valid split for file corpora).
    probe_clips = None
    probe_dir_gs = None
    if args.probe_every and args.probe_dir:
        # Real-clip probe: selection on real non-eval clips targets
        # synthetic->real transfer directly (the in-domain probe can prefer
        # checkpoints that do not transfer; measured on the round-3 refiner).
        from ml_audio_inpainting_tpu.data.probe import load_real_probe_set

        pclips, probe_dir_gs, n_pfiles = load_real_probe_set(
            args.probe_dir, args.probe_positions, cfg.data.sample_rate,
            cfg.data.max_len_s, gap_len_s=args.probe_gap_len,
        )
        probe_clips = jnp.asarray(pclips)
        run.logger.info(
            "real probe: %d clips x %d positions from %s",
            n_pfiles, len(args.probe_positions), args.probe_dir,
        )
    elif args.probe_every:
        if args.synthetic:
            probe_ds = _synthetic_cls(args)(
                n_items=args.probe_clips,
                sample_rate=cfg.data.sample_rate,
                max_len_s=cfg.data.max_len_s,
                seed=4242,
            )
        else:
            from ml_audio_inpainting_tpu.data.dataset import AudioFileDataset

            vroot = Path(args.data_root or cfg.data.root_path) / cfg.data.valid_path
            probe_ds = (
                AudioFileDataset(
                    vroot,
                    sample_rate=cfg.data.sample_rate,
                    max_len_s=cfg.data.max_len_s,
                    max_files=args.probe_clips,
                )
                if vroot.exists()
                else None
            )
        if probe_ds is not None and len(probe_ds) > 0:
            k = min(args.probe_clips, len(probe_ds))
            probe_clips = jnp.asarray(np.stack([probe_ds[i] for i in range(k)]))
        else:
            run.logger.warning("--probe-every set but no probe source; disabled")

    probe_state = {"best": -np.inf, "best_step": -1, "stale": 0}
    best_ckpt = None
    if probe_clips is not None:
        from ml_audio_inpainting_tpu.ops.gaps import gap_mask
        from ml_audio_inpainting_tpu.train.auditory import psm_score
        from ml_audio_inpainting_tpu.train.metrics import gap_sdr

        best_ckpt = CheckpointManager(
            run.checkpoint_dir / "best", save_interval_steps=1, max_to_keep=1
        )
        k = probe_clips.shape[0]
        gl = int(args.probe_gap_len * cfg.data.sample_rate)
        if gl > probe_clips.shape[-1] // 2:
            # A probe gap at/above the clip length degenerates to scoring
            # whole-clip synthesis; cap at half the clip and say so.
            gl = probe_clips.shape[-1] // 2
            run.logger.warning(
                "probe gap %.3fs exceeds half the %.3fs clip; clamped to %.3fs",
                args.probe_gap_len, probe_clips.shape[-1] / cfg.data.sample_rate,
                gl / cfg.data.sample_rate,
            )
        gs = int(2.0 * cfg.data.sample_rate)
        if gs + gl >= probe_clips.shape[-1]:  # clip shorter than the eval spec
            gs = max(0, (probe_clips.shape[-1] - gl) // 2)
        if probe_dir_gs is not None:
            probe_gs = jnp.asarray(
                np.clip(probe_dir_gs, 0, probe_clips.shape[-1] - gl - 1),
                jnp.int32,
            )
        else:
            probe_gs = jnp.full((k,), gs, jnp.int32)
        probe_gl = jnp.full((k,), gl, jnp.int32)
        probe_gapm = 1.0 - jax.vmap(
            lambda s, l: gap_mask(probe_clips.shape[-1], s, l)
        )(probe_gs, probe_gl)

        def run_probe(step, inpaint_fn, variables, payload):
            """Returns True when patience is exhausted (stop training)."""
            restored, _ = inpaint_fn(variables, probe_clips, probe_gs, probe_gl)
            sdr = float(np.mean(np.asarray(gap_sdr(probe_clips, restored, probe_gapm))))
            psm = float(np.mean(np.asarray(psm_score(probe_clips, restored))))
            run.scalar("Probe/gap_sdr_db", sdr, step)
            run.scalar("Probe/psm", psm, step)
            if sdr > probe_state["best"] + 1e-6:
                probe_state.update(best=sdr, best_step=step, stale=0)
                best_ckpt.save(step, jax.device_get(payload), force=True)
                run.logger.info(
                    "probe @ step %d: gap-SDR %.2f dB, PSM %.3f (new best)",
                    step, sdr, psm,
                )
                return False
            probe_state["stale"] += 1
            run.logger.info(
                "probe @ step %d: gap-SDR %.2f dB, PSM %.3f (best %.2f @ %d, stale %d)",
                step, sdr, psm, probe_state["best"], probe_state["best_step"],
                probe_state["stale"],
            )
            return bool(
                args.probe_patience and probe_state["stale"] >= args.probe_patience
            )

    epochs = cfg.training.epochs if args.model == "gan" else cfg.training.max_n_epochs
    feed_mode = args.feed
    if feed_mode == "auto":
        # The two feeds yield bit-identical epoch orderings (pipeline.py),
        # so this is purely a throughput choice: device-resident wins
        # whenever the corpus fits HBM NEXT TO the training step's working
        # set.  The step estimate is anchored on the measured XLA
        # memory_analysis of the full fused GAN step — 9.6 GiB at B=32
        # bf16, and the B=32 f32 step measured fitting alongside a 610 MiB
        # corpus (results/README.md) — scaled linearly in batch and 1.5x
        # for f32 activations.  The anchor is the LARGEST family's step
        # (GAN+VGG), so the CNN family errs toward the safe streamed feed.
        # An OOM here is worse than a slow feed: on this platform it wedges
        # the remote-compile relay for 10+ minutes (CLAUDE.md).
        corpus_bytes = len(dataset) * cfg.data.max_samples * 4
        step_gib = 9.6 * (cfg.training.batch_size / 32.0) * (
            1.0 if args.train_dtype == "bf16" else 1.5
        )
        headroom_bytes = (15.5 - step_gib) * 1024**3
        device_ok = corpus_bytes <= min(2 * 1024**3, headroom_bytes)
        feed_mode = "device" if device_ok else "stream"
        run.logger.info(
            "feed auto -> %s (corpus ~%.0f MiB f32, step est ~%.1f GiB %s "
            "B=%d, headroom ~%.1f GiB)",
            feed_mode, corpus_bytes / 2**20, step_gib, args.train_dtype,
            cfg.training.batch_size, max(headroom_bytes, 0.0) / 2**30,
        )
    if feed_mode == "device":
        from ml_audio_inpainting_tpu.data.pipeline import device_corpus_feed

        feed = device_corpus_feed(
            dataset, cfg.training.batch_size, shuffle=True, seed=args.seed,
            epochs=epochs, sharding=batch_sharding(mesh),
            workers=args.workers, logger=run.logger,
        )
    else:
        batches = batch_iterator(
            dataset, cfg.training.batch_size, shuffle=True, seed=args.seed,
            epochs=epochs, workers=args.workers,
        )
        feed = prefetch_to_device(batches, size=2, sharding=batch_sharding(mesh))

    ckpt = CheckpointManager(
        run.checkpoint_dir, save_interval_steps=1, max_to_keep=5
    )
    # Cross-run resume: restore from another run's dir, keep saving to ours.
    resume_src = ckpt if args.resume else None
    if args.resume_from:
        resume_src = CheckpointManager(args.resume_from, max_to_keep=None)
        if resume_src.latest_step() is None:
            raise SystemExit(f"--resume-from {args.resume_from}: no checkpoint found")
    key = jax.random.PRNGKey(args.seed)
    steps_per_epoch = max(1, len(dataset) // cfg.training.batch_size)
    ckpt_every = cfg.logging.checkpoint_interval * steps_per_epoch

    if args.model == "cnn_blstm":
        from ml_audio_inpainting_tpu.train.cnn_trainer import (
            create_cnn_state,
            make_cnn_train_step,
        )

        state = create_cnn_state(cfg, key, ema=args.ema)
        if resume_src is not None and resume_src.latest_step() is not None:
            state = resume_src.restore(state)
            run.logger.info("resumed from step %s", resume_src.latest_step())
        cnn_compute_dtype = jnp.bfloat16 if args.train_dtype == "bf16" else None
        step_fn = make_sharded_step(
            make_cnn_train_step(
                cfg, ema=args.ema, compute_dtype=cnn_compute_dtype,
                phase_mode=args.phase_mode, phase_anchor=args.phase_anchor,
            ),
            state,
            mesh,
        )
        state = place_state(state, mesh)
        if args.valid_every:
            from ml_audio_inpainting_tpu.train.cnn_trainer import make_cnn_eval_step

            eval_fn = make_cnn_eval_step(
                cfg, phase_mode=args.phase_mode, phase_anchor=args.phase_anchor
            )

        probe_fn = None
        if probe_clips is not None:
            from ml_audio_inpainting_tpu.runtime.inference import (
                make_cnn_inpaint_fn,
                make_cnn_phase_inpaint_fn,
            )
            from ml_audio_inpainting_tpu.train.cnn_trainer import build_model

            probe_fn = (
                make_cnn_phase_inpaint_fn(
                    cfg, build_model(cfg), anchored=args.phase_anchor
                )
                if args.phase_mode
                else make_cnn_inpaint_fn(cfg, build_model(cfg))
            )

        def cnn_probe(step, state):
            # Serve the EMA weights when enabled (what deployment would use).
            serve = (
                state.ema_params
                if state.ema_params is not None else state.params
            )
            variables = {"params": jax.device_get(serve)}
            if state.batch_stats is not None:
                variables["batch_stats"] = jax.device_get(state.batch_stats)
            return run_probe(step, probe_fn, variables, state)

        step = int(state.step)
        last = [step, time.perf_counter()]
        for audio in feed:
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, audio, sub)
            step += 1
            if step % cfg.logging.metric_interval == 0:
                loss = float(metrics["loss"])
                now = time.perf_counter()
                # Rolling rate over the last interval (total-elapsed rate
                # folds the minutes-long first compile in and understates).
                rate = (step - last[0]) / max(now - last[1], 1e-9)
                last[:] = [step, now]
                run.scalar("Loss_Train/L1_gap", loss, step)
                run.logger.info("step %d loss %.4f (%.2f steps/s)", step, loss, rate)
            if args.valid_every and step % args.valid_every == 0:
                run_validation(eval_fn, (state,), step, jax.random.PRNGKey(123))
            if probe_fn is not None and step % args.probe_every == 0 and cnn_probe(step, state):
                run.logger.info("early stop at step %d (probe patience)", step)
                break
            if step % ckpt_every == 0:
                ckpt.save(step, jax.device_get(state))
            if args.steps and step >= args.steps:
                break
        ckpt.save(step, jax.device_get(state), force=True)

    else:  # gan
        from ml_audio_inpainting_tpu.models.vgg import vgg19_params
        from ml_audio_inpainting_tpu.parallel.mesh import replicated
        from ml_audio_inpainting_tpu.parallel.sharding import state_shardings
        from ml_audio_inpainting_tpu.train.gan_trainer import (
            create_gan_states,
            make_gan_train_step,
        )

        g_state, d_state = create_gan_states(cfg, key, g_ema=args.ema)
        use_vgg = (
            cfg.training.lambda_vgg_perceptual > 0 or cfg.training.lambda_vgg_style > 0
        )
        vgg = vgg19_params() if use_vgg else None
        compute_dtype = jnp.bfloat16 if args.train_dtype == "bf16" else None
        step_fn = make_gan_train_step(
            cfg, vgg=vgg, compute_dtype=compute_dtype, remat=args.remat,
            g_ema=args.ema,
        )
        g_sh = state_shardings(g_state, mesh)
        d_sh = state_shardings(d_state, mesh)
        step_fn = jax.jit(
            step_fn,
            in_shardings=(g_sh, d_sh, batch_sharding(mesh), replicated(mesh)),
            out_shardings=(g_sh, d_sh, replicated(mesh)),
        )
        if resume_src is not None and resume_src.latest_step() is not None:
            restored = resume_src.restore({"g": g_state, "d": d_state})
            g_state, d_state = restored["g"], restored["d"]
            run.logger.info("resumed from step %s", resume_src.latest_step())
        g_state = jax.device_put(g_state, g_sh)
        d_state = jax.device_put(d_state, d_sh)

        # Sample generation (train.py:419-506): periodic audio + spectrogram
        # dumps of the generator's current reconstruction.
        from ml_audio_inpainting_tpu.data.audio_io import save_audio
        from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
        from ml_audio_inpainting_tpu.train.gan_trainer import build_generator
        from ml_audio_inpainting_tpu.utils.visualize import visualize_spectrogram

        sample_fn = make_gan_inpaint_fn(cfg, build_generator(cfg), mode="parity")
        sample_clip = jnp.asarray(dataset[0])[None, :]
        sample_gap = (
            jnp.asarray([int(2.0 * cfg.data.sample_rate) % max(1, cfg.data.max_samples - 1)]),
            jnp.asarray([int(cfg.data.gap_len_s * cfg.data.sample_rate)]),
        )

        def dump_samples(step):
            variables = {"params": jax.device_get(g_state.params)}
            if g_state.batch_stats is not None:
                variables["batch_stats"] = jax.device_get(g_state.batch_stats)
            restored, gen_spec = sample_fn(variables, sample_clip, *sample_gap)
            wav = np.asarray(restored[0])
            save_audio(wav, run.sample_dir / f"sample_step{step:07d}.flac", cfg.data.sample_rate)
            run.audio("Samples/reconstruction", wav, step, cfg.data.sample_rate)
            fig = visualize_spectrogram(
                np.asarray(gen_spec[0]),
                hop_length=cfg.data.spectrogram.hop_length,
                n_fft=cfg.data.spectrogram.n_fft,
                win_length=cfg.data.spectrogram.win_length,
                in_db=False,
                title=f"Generated (step {step})",
            )
            if fig is not None:
                run.figure("Samples/generated_spectrogram", fig, step)

        gan_eval_fn = None
        if args.valid_every:
            from ml_audio_inpainting_tpu.train.gan_trainer import make_gan_eval_step

            gan_eval_fn = make_gan_eval_step(cfg, vgg=vgg)

        gan_probe_fn = None
        if probe_clips is not None:
            # Probe through the production serving mode (the headline eval
            # condition), not the parity TB sampler.
            gan_probe_fn = make_gan_inpaint_fn(
                cfg, build_generator(cfg), mode="enhanced"
            )

        def gan_probe(step):
            # Serve the EMA weights when enabled (what deployment would use;
            # live weights still drive the adversarial game).
            serve = (
                g_state.ema_params
                if g_state.ema_params is not None else g_state.params
            )
            variables = {"params": jax.device_get(serve)}
            if g_state.batch_stats is not None:
                variables["batch_stats"] = jax.device_get(g_state.batch_stats)
            return run_probe(
                step, gan_probe_fn, variables, {"g": g_state, "d": d_state}
            )

        step = int(g_state.step)
        last = [step, time.perf_counter()]
        for audio in feed:
            key, sub = jax.random.split(key)
            g_state, d_state, metrics = step_fn(g_state, d_state, audio, sub)
            step += 1
            if step % cfg.logging.log_interval == 0:
                now = time.perf_counter()
                rate = (step - last[0]) / max(now - last[1], 1e-9)
                last[:] = [step, now]
                for tag, k in [
                    ("Loss_Train/Generator_Total", "g_total"),
                    ("Loss_Train/Discriminator", "d_total"),
                    ("Loss_Train/Generator_Adversarial", "g_adv"),
                    ("Loss_Train/Generator_L1_Valid", "g_l1_valid"),
                    ("Loss_Train/Generator_L1_Hole", "g_l1_hole"),
                    ("Loss_Train/Generator_MagWeighted", "g_mag_weighted"),
                    ("Loss_Train/Generator_VGG_Perceptual", "g_vgg_perceptual"),
                    ("Loss_Train/Generator_VGG_Style", "g_vgg_style"),
                    ("Loss_Train/Discriminator_Real", "d_real"),
                    ("Loss_Train/Discriminator_Fake", "d_fake"),
                ]:
                    run.scalar(tag, float(metrics[k]), step)
                run.logger.info(
                    "step %d g_total %.4f d_total %.4f (%.2f steps/s)",
                    step, float(metrics["g_total"]), float(metrics["d_total"]), rate,
                )
            if step % cfg.logging.sample_interval == 0:
                dump_samples(step)
            if args.valid_every and step % args.valid_every == 0:
                run_validation(
                    gan_eval_fn, (g_state, d_state), step, jax.random.PRNGKey(123)
                )
            if gan_probe_fn is not None and step % args.probe_every == 0 and gan_probe(step):
                run.logger.info("early stop at step %d (probe patience)", step)
                break
            if step % ckpt_every == 0:
                ckpt.save(step, jax.device_get({"g": g_state, "d": d_state}))
            if args.steps and step >= args.steps:
                break
        ckpt.save(step, jax.device_get({"g": g_state, "d": d_state}), force=True)

    ckpt.wait()
    ckpt.close()
    if best_ckpt is not None:
        best_ckpt.wait()
        if probe_state["best_step"] >= 0:
            run.logger.info(
                "best probe checkpoint: step %d (gap-SDR %.2f dB) under %s",
                probe_state["best_step"], probe_state["best"],
                run.checkpoint_dir / "best",
            )
            # Deployment-ready artifact: export the probe-best INFERENCE
            # variables (params + batch_stats, no optimizer state) as a
            # compact f16 npz accepted by evaluate/inpaint --checkpoint.
            # Previous rounds did this restore->export by hand every time a
            # run finished; the committed headline checkpoints under
            # results/checkpoints/ are exactly this artifact.
            from ml_audio_inpainting_tpu.train.checkpoints import export_params_npz

            template = (
                {"g": g_state, "d": d_state} if args.model == "gan" else state
            )
            best = best_ckpt.restore(template, step=probe_state["best_step"])
            bstate = best["g"] if args.model == "gan" else best
            bparams = (
                bstate.ema_params
                if getattr(bstate, "ema_params", None) is not None
                else bstate.params
            )
            variables = {"params": bparams}
            if bstate.batch_stats is not None:
                variables["batch_stats"] = bstate.batch_stats
            npz_path = run.checkpoint_dir / "best_inference.npz"
            export_params_npz(npz_path, jax.device_get(variables))
            run.logger.info("probe-best inference weights exported: %s", npz_path)
        best_ckpt.close()
    run.logger.info("training done at step %d", step)
    run.close()


if __name__ == "__main__":
    main()
