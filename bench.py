"""Benchmark: seconds of audio inpainted per second per chip.

Default mode runs the flagship end-to-end inference pipeline -- gapped
waveform -> STFT -> PConv U-Net generator -> iSTFT reconstruction -- as one
jitted XLA program, batched over 5 s / 16 kHz clips (the reference's
``models/model_eval.py`` serve path, BASELINE.json config #4), and prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.  ``vs_baseline``
is value / 100, the multiple of the BASELINE.json north-star target of
>=100x realtime per chip (the reference records no throughput numbers of
its own -- BASELINE.md).

The canonical value measures the PRODUCTION serving loop (round 5+):
window-2 pipelined dispatch + GAP-ONLY PCM16 transport
(``runtime/transport.py``) -- the host fetches only the reconstructed gap
window (128 ms) plus its offset, because the compositing contract makes
every other byte identical to the client's input (the delivered clip is
reproduced EXACTLY, int16-for-int16 -- pinned in tests/test_transport.py).
That cuts wire bytes ~39x vs the round-3/4 full-clip PCM16 fetch and moves
the bottleneck from the tunneled host link to device compute.  For
continuity the same JSON line still reports the previous canonical loops:
``full_pcm16_w2_s_audio_per_s`` (round 3/4 canonical) and
``serialized_f32_s_audio_per_s`` (round 1/2), plus
``device_only_s_audio_per_s`` -- a link-independent rate from 10
scan-chained on-device forwards with a single scalar fetch (the
weather-proof cross-round regression signal).  The canonical program is
``mode="enhanced"`` (composited output; parity mode never composites, so
a gap-only transport cannot represent it).

``--all`` additionally measures the other BASELINE.json configs (one JSON
line each, after the canonical line): STFT+gap preprocessing, CNN+BiLSTM
inference, classical Janssen inference, and CNN+BiLSTM training throughput.
"""

import json
import sys
import time

import numpy as np


def _measure_times(fn, *args, iters=10, warmup=1):
    """Per-call wall times (seconds); materializes the output each call (on
    the tunneled axon platform ``block_until_ready`` returns early, so host
    materialization is the only honest completion barrier)."""
    for _ in range(warmup):
        np.asarray(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return np.asarray(times)


def _measure(fn, *args, iters=10, warmup=1):
    """Median per-call wall time."""
    return float(np.median(_measure_times(fn, *args, iters=iters, warmup=warmup)))


def _link_probe(jax, jnp, mb: float = 8.0):
    """Fixed-size host<->device transfer probe (VERDICT r3 #5).

    The canonical serving number is host-link-bound in this environment and
    swings 1.5x across captures with relay load; these fields make every
    capture carry its own link state so cross-round comparisons can separate
    code regressions from relay weather.  On the axon platform
    ``block_until_ready`` returns early, so a 1-element reduction fetch is
    the completion barrier: ``up`` therefore includes one RTT + a trivial
    reduce (negligible vs the 8 MB payload).
    """
    import time as _time

    n = int(mb * 1024 * 1024 // 4)
    host = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    reduce_fn = jax.jit(jnp.sum)
    # The download probe must fetch a COMPUTED device array: fetching the
    # uploaded array back would be served from its committed host copy
    # without touching the wire (first capture measured a bogus 131 GB/s).
    # It must also fetch a DIFFERENT array each repeat -- jax caches the
    # host copy on first device->host transfer, so re-fetching the same
    # array times a memcpy (second bogus capture: 135 GB/s median-of-3
    # where repeats 2-3 were cache hits).
    add = jax.jit(lambda x, c: x + c)
    devs = [add(jnp.asarray(host), float(i)) for i in range(3)]
    np.asarray(reduce_fn(devs[0]))  # compile + settle

    tiny = jnp.zeros((8,), jnp.float32)
    np.asarray(reduce_fn(tiny))
    rtts = []
    for _ in range(5):
        t0 = _time.perf_counter()
        np.asarray(reduce_fn(tiny))
        rtts.append(_time.perf_counter() - t0)
    rtt_ms = 1000.0 * float(np.median(rtts))

    downs = []
    for dev in devs:
        np.asarray(reduce_fn(dev))  # settle: the add must not count as fetch time
        t0 = _time.perf_counter()
        np.asarray(dev)
        downs.append(_time.perf_counter() - t0)
    down_mbps = mb / float(np.median(downs))

    ups = []
    for _ in range(3):
        t0 = _time.perf_counter()
        d = jnp.asarray(host)
        np.asarray(reduce_fn(d))
        ups.append(_time.perf_counter() - t0)
    up_mbps = mb / float(np.median(ups))

    return {
        "link_down_mbps": round(down_mbps, 1),
        "link_up_mbps": round(up_mbps, 1),
        "link_rtt_ms": round(rtt_ms, 2),
    }


def main() -> None:
    from ml_audio_inpainting_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # persistent compile cache; honors JAX_PLATFORMS
    import jax
    import jax.numpy as jnp

    from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset
    from ml_audio_inpainting_tpu.runtime.inference import make_gan_inpaint_fn
    from ml_audio_inpainting_tpu.train.gan_trainer import build_generator
    from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

    # --all: every BASELINE.json config + train sections. --serving: the
    # canonical line + the serving-transport lines only (cheap re-capture).
    # --train: the canonical line + the train-throughput/MFU lines only
    # (cheap re-capture after a training-step optimization).
    run_serving = "--serving" in sys.argv
    run_train = "--train" in sys.argv
    run_all = "--all" in sys.argv
    run_any = run_all or run_serving or run_train

    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    cfg.data.max_len_s = 5.0

    import os

    # Canonical batch is 32 (best measured single-chip HBM fit; B=64 f32
    # exceeds 16G).  MAI_BENCH_BATCH overrides for CPU smoke runs only.
    batch = int(os.environ.get("MAI_BENCH_BATCH", "32"))
    clip_s = cfg.data.max_len_s
    ds = SyntheticSpeechDataset(n_items=batch, max_len_s=clip_s)
    audio = jnp.asarray(np.stack([ds[i] for i in range(batch)]))
    gap_start = jnp.full((batch,), 32000, jnp.int32)
    gap_len = jnp.full((batch,), 1280, jnp.int32)  # 80 ms eval gap

    gen = build_generator(cfg)
    variables = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 257, 626)),
        jnp.ones((1, 257, 626)),
        train=False,
    )
    fn = make_gan_inpaint_fn(cfg, gen)

    # Link-state instrumentation: measured BEFORE the workload so the
    # canonical line records the relay weather it was captured under.
    link = _link_probe(jax, jnp)

    # The serialized f32-fetch path: kept as an explicit JSON field for
    # continuity with the round-1/2 captures (it was the canonical value
    # through round 2).
    times = _measure_times(lambda: fn(variables, audio, gap_start, gap_len)[0], iters=10)
    dt_serial = float(np.median(times))
    serial_value = batch * clip_s / dt_serial

    # Round-3/4 canonical (kept as a field): window-2 pipelined dispatch
    # with the FULL-clip int16 PCM fetch (ops/pcm.py).
    from ml_audio_inpainting_tpu.ops.pcm import to_pcm16

    pcm_fn = jax.jit(lambda v, a, s, l: to_pcm16(fn(v, a, s, l)[0]))

    def _w2_loop(call, n=10):
        t0 = time.perf_counter()
        pending = None
        for _ in range(n):
            nxt = call()
            if pending is not None:
                jax.tree_util.tree_map(np.asarray, pending)
            pending = nxt
        jax.tree_util.tree_map(np.asarray, pending)
        return (time.perf_counter() - t0) / n

    full_call = lambda: pcm_fn(variables, audio, gap_start, gap_len)
    _w2_loop(full_call, n=2)  # warmup / compile
    full_times = np.asarray([_w2_loop(full_call) for _ in range(3)])
    full_pcm16_value = batch * clip_s / float(np.median(full_times))

    # CANONICAL (round 5+): gap-only PCM16 transport over the composited
    # (enhanced-mode) serving program, window-2 pipelined.  The wire
    # payload per batch is one 128 ms int16 patch + offset per clip
    # (~131 KB at B=32) instead of the full 5 s clips (5.12 MB) -- the
    # compositing contract guarantees the client reconstructs the full
    # deliverable exactly (runtime/transport.py, tests/test_transport.py).
    # Measured as 5 repeats of a 10-deep loop; median + IQR over repeats.
    from ml_audio_inpainting_tpu.runtime.transport import make_gap_transport_fn

    fn_enh = make_gan_inpaint_fn(cfg, gen, mode="enhanced")
    gap_fn = make_gap_transport_fn(fn_enh)
    gap_call = lambda: gap_fn(variables, audio, gap_start, gap_len)
    _w2_loop(gap_call, n=2)  # warmup / compile
    rep_times = np.asarray([_w2_loop(gap_call) for _ in range(5)])
    dt = float(np.median(rep_times))
    q1, q3 = np.percentile(batch * clip_s / rep_times, [25, 75])
    value = batch * clip_s / dt

    # Link-independent serving rate (VERDICT r4 #6): K scan-chained
    # on-device forwards (a data dependency between iterations defeats
    # CSE), ONE scalar fetch -- one link RTT amortized over K forwards, so
    # the number tracks the compiled program, not relay weather.
    K_CHAIN = 10

    @jax.jit
    def chained(v, a, s, l):
        def body(c, _):
            r, _aux = fn_enh(v, a + c, s, l)
            return jnp.sum(r) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.zeros((), a.dtype), None, length=K_CHAIN)
        return c

    np.asarray(chained(variables, audio, gap_start, gap_len))  # compile
    dev_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(variables, audio, gap_start, gap_len))
        dev_times.append(time.perf_counter() - t0)
    dt_dev = float(np.median(dev_times)) / K_CHAIN
    device_only_value = batch * clip_s / dt_dev

    # MFU: compiled-graph FLOPs (XLA cost analysis) over chip peak.  The
    # serving numbers in this environment are host-link-bound
    # (results/README.md), so a low MFU here quantifies the remaining chip
    # headroom rather than a kernel deficiency.
    PEAK_BF16_FLOPS = {
        "TPU v5 lite": 197e12,  # v5e
        "TPU v4": 275e12,
        "TPU v5": 459e12,  # v5p
        "TPU v6 lite": 918e12,  # v6e / Trillium
    }
    device_kind = jax.devices()[0].device_kind
    mfu = None
    try:
        compiled = gap_fn.lower(
            variables, audio, gap_start, gap_len
        ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        peak = PEAK_BF16_FLOPS.get(device_kind)
        if flops > 0 and peak:
            mfu = round(flops / dt / peak, 5)
    except Exception:
        pass  # cost analysis is best-effort; some backends lack it

    # B>32 finding (VERDICT r1 #8): f32 OOMs at B=64 on one chip; bf16
    # activations fit.  Record the achieved bf16 B=64 throughput (or null).
    b64_value = None
    try:
        if batch != 32:
            raise RuntimeError("b64 probe only in canonical mode")
        fn64 = make_gan_inpaint_fn(cfg, gen, compute_dtype=jnp.bfloat16)
        ds64 = SyntheticSpeechDataset(n_items=64, max_len_s=clip_s)
        audio64 = jnp.asarray(np.stack([ds64[i] for i in range(64)]))
        gs64 = jnp.full((64,), 32000, jnp.int32)
        gl64 = jnp.full((64,), 1280, jnp.int32)
        dt64 = _measure(lambda: fn64(variables, audio64, gs64, gl64)[0], iters=5)
        b64_value = round(64 * clip_s / dt64, 2)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "audio_seconds_inpainted_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "s_audio/s/chip",
                "vs_baseline": round(value / 100.0, 3),
                "mode": "pipelined_w2_gap_pcm16",
                "full_pcm16_w2_s_audio_per_s": round(full_pcm16_value, 2),
                "serialized_f32_s_audio_per_s": round(serial_value, 2),
                "device_only_s_audio_per_s": round(device_only_value, 2),
                "batch": batch,
                "n_repeats": len(rep_times),
                "iqr": [round(float(q1), 2), round(float(q3), 2)],
                "mfu": mfu,
                "device_kind": device_kind,
                "b64_bf16_s_audio_per_s": b64_value,
                **link,
            }
        )
    )

    if not run_any:
        return

    def emit(metric, value, unit, **extra):
        print(json.dumps(
            {"metric": metric, "value": round(value, 2), "unit": unit, **extra}
        ))

    if run_all or run_serving:
        # Pipelined serving throughput, bounded in-flight window of 2:
        # dispatch batch i+1 before draining batch i so device compute can
        # overlap the host transfer.  The round-2 unbounded
        # dispatch-all-then-drain variant measured 2.2x SLOWER than the
        # serialized path -- queued materializations serialize at the axon
        # relay, so an unbounded queue only adds relay contention.  The
        # bounded window-2 form is the production serving loop and measures
        # 1.4-2.6x the serialized path across TPU captures (the device
        # computes batch i+1 while the host drains batch i; the spread is
        # relay weather -- see the link_* fields).
        iters = 10
        t0 = time.perf_counter()
        pending = None
        for _ in range(iters):
            nxt = fn(variables, audio, gap_start, gap_len)[0]
            if pending is not None:
                np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        dt_pipe = (time.perf_counter() - t0) / iters
        emit(
            "pipelined_inference_audio_seconds_per_sec",
            batch * clip_s / dt_pipe,
            "s_audio/s/chip",
            window=2,
        )

        # Serving with the int16 PCM fetch alone (serialized dispatch), to
        # separate the two composing transport wins in the canonical line.
        # pcm_fn was built (and compiled) for the canonical measurement above.
        dt_pcm = _measure(lambda: pcm_fn(variables, audio, gap_start, gap_len), iters=10)
        emit(
            "pcm16_serving_audio_seconds_per_sec",
            batch * clip_s / dt_pcm,
            "s_audio/s/chip",
            note="int16 output fetch (deliverable PCM precision; half the f32 bytes)",
        )

        # Best-known serving configuration: bounded window-2 pipelining AND
        # the int16 fetch combined (both transport-side wins compose).
        t0 = time.perf_counter()
        pending = None
        for _ in range(iters):
            nxt = pcm_fn(variables, audio, gap_start, gap_len)
            if pending is not None:
                np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        dt_best = (time.perf_counter() - t0) / iters
        emit(
            "pcm16_pipelined_w2_audio_seconds_per_sec",
            batch * clip_s / dt_best,
            "s_audio/s/chip",
            note="production serving loop: window-2 overlap + int16 fetch",
        )

        # Gap-only transport decomposition: serialized dispatch (isolates the
        # transport win from the w2 overlap win) and the device-only rate
        # (already measured for the canonical line).
        def _gap_fetch():
            p, s = gap_fn(variables, audio, gap_start, gap_len)
            np.asarray(s)
            return p  # _measure materializes the patch

        dt_gap_serial = _measure(_gap_fetch, iters=10)
        emit(
            "gap_pcm16_serving_audio_seconds_per_sec",
            batch * clip_s / dt_gap_serial,
            "s_audio/s/chip",
            note="gap-only int16 patch fetch, serialized dispatch",
        )
        emit(
            "device_only_serving_audio_seconds_per_sec",
            device_only_value,
            "s_audio/s/chip",
            note="10 scan-chained forwards, one scalar fetch: link-independent",
        )

        # All serving levers composed: B=64 bf16 generator compute (fits HBM
        # where f32 does not; quality-neutral,
        # results/gan_v2_bf16_serving.json) + int16 fetch + w2 pipelining.
        try:
            if batch != 32:
                raise RuntimeError("b64 probe only in canonical mode")
            fn64b = make_gan_inpaint_fn(cfg, gen, compute_dtype=jnp.bfloat16)
            pcm64 = jax.jit(lambda v, a, s, l: to_pcm16(fn64b(v, a, s, l)[0]))
            ds64b = SyntheticSpeechDataset(n_items=64, max_len_s=clip_s)
            a64 = jnp.asarray(np.stack([ds64b[i] for i in range(64)]))
            gs64b = jnp.full((64,), 32000, jnp.int32)
            gl64b = jnp.full((64,), 1280, jnp.int32)
            np.asarray(pcm64(variables, a64, gs64b, gl64b))  # warmup/compile
            t0 = time.perf_counter()
            pending = None
            for _ in range(iters):
                nxt = pcm64(variables, a64, gs64b, gl64b)
                if pending is not None:
                    np.asarray(pending)
                pending = nxt
            np.asarray(pending)
            dt64w = (time.perf_counter() - t0) / iters
            emit(
                "pcm16_pipelined_w2_b64_bf16_audio_seconds_per_sec",
                64 * clip_s / dt64w,
                "s_audio/s/chip",
                note="all serving levers: B=64 + bf16 compute + int16 fetch + w2 overlap",
            )

            # ... and with the round-5 gap-only transport on top.
            fn64e = make_gan_inpaint_fn(
                cfg, gen, mode="enhanced", compute_dtype=jnp.bfloat16
            )
            gap64 = make_gap_transport_fn(fn64e)
            gap64_call = lambda: gap64(variables, a64, gs64b, gl64b)
            _w2_loop(gap64_call, n=2)
            dt64g = _w2_loop(gap64_call, n=iters)
            emit(
                "gap_pcm16_pipelined_w2_b64_bf16_audio_seconds_per_sec",
                64 * clip_s / dt64g,
                "s_audio/s/chip",
                note="all levers + gap-only transport: B=64 + bf16 + gap patch fetch + w2",
            )
        except Exception:
            pass

        # End-to-end PCM16 transport loop: int16 host->device upload INSIDE
        # the timed loop, on-device dequantize -> inpaint -> quantize, int16
        # fetch.  This is the full production serving transaction (the other
        # lines stage the input on device outside the timer).
        from ml_audio_inpainting_tpu.ops.pcm import from_pcm16

        e2e_fn = jax.jit(
            lambda v, a, s, l: to_pcm16(fn(v, from_pcm16(a), s, l)[0])
        )
        host_pcm = np.asarray(to_pcm16(audio))
        dt_e2e = _measure(
            lambda: e2e_fn(variables, jnp.asarray(host_pcm), gap_start, gap_len),
            iters=10,
        )
        emit(
            "pcm16_e2e_transport_audio_seconds_per_sec",
            batch * clip_s / dt_e2e,
            "s_audio/s/chip",
            note="int16 upload + dequant + inpaint + quant + int16 fetch, all timed",
        )

        # Single-clip (B=1) serving latency: the production latency number
        # for interactive use. Batched shape (1, S) -- the axon backend
        # cannot materialize unbatched outputs (CLAUDE.md gotcha).
        a1, gs1, gl1 = audio[:1], gap_start[:1], gap_len[:1]
        dt_b1 = _measure(lambda: fn(variables, a1, gs1, gl1)[0], iters=10)
        emit("gan_serving_latency_ms_b1", 1000.0 * dt_b1, "ms")
        dt_b1p = _measure(lambda: pcm_fn(variables, a1, gs1, gl1), iters=10)
        emit("gan_serving_latency_ms_b1_pcm16", 1000.0 * dt_b1p, "ms")

        # Long-form serving (VERDICT r3 #8): a 60 s clip with three 80 ms
        # gaps through runtime/longform.py windowed batching + Hann OLA.
        # pad_batches=True reuses the canonical (batch, 80000) compiled
        # serving program, so the whole long-form pass is compile-free --
        # the neural analogue of the reference's MATLAB OLA segmenter
        # (models/AudioReg/utils/segmentation_inp.m:89-148).
        from ml_audio_inpainting_tpu.runtime.longform import longform_inpaint

        long_s = 60.0
        dsl = SyntheticSpeechDataset(n_items=1, max_len_s=long_s)
        long_audio = jnp.asarray(np.asarray(dsl[0]))
        lg_starts = np.asarray([200000, 480000, 760000])
        lg_lens = np.full(3, 1280)
        dt_long = _measure(
            lambda: longform_inpaint(
                fn,
                variables,
                long_audio,
                lg_starts,
                lg_lens,
                window=80000,
                hop=40000,
                batch_size=batch,
                pad_batches=True,
            ),
            iters=3,
        )
        emit(
            "longform_audio_seconds_per_sec",
            long_s / dt_long,
            "s_audio/s/chip",
            note="60 s clip, 3x80 ms gaps, 5 s windows + Hann OLA, reuses the canonical compiled program",
        )

        # Long-form with every round-5 lever (VERDICT r4 #5): right-sized
        # model batch (the 3-gap case needs 6 windows, not a 32-pad), the
        # fused scatter+OLA+composite+slice epilogue, and the gap-only
        # PCM16 fetch (3 patches, ~12 KB, vs the 3.84 MB f32 waveform).
        def _long_gap():
            p, s = longform_inpaint(
                fn_enh, variables, long_audio, lg_starts, lg_lens,
                window=80000, hop=40000, batch_size=8, pad_batches=True,
                gap_fetch=2048,
            )
            np.asarray(s)
            return p

        _long_gap()  # compile the (8, 80000) program + epilogue
        dt_long_gap = _measure(_long_gap, iters=5)
        emit(
            "longform_gap_pcm16_audio_seconds_per_sec",
            long_s / dt_long_gap,
            "s_audio/s/chip",
            note="batch-8 right-sized windows + fused epilogue + gap-only int16 patch fetch",
        )

        # Fully-fused centered path: ONE compiled program (window gather +
        # model + composite + patch slice) and one tiny fetch per call --
        # the measured decomposition showed the OLA grid's chunk/gather/
        # scatter stages are ~1 dispatch RTT each and half its model work
        # feeds samples the composite discards
        # (results/longform_decomposition.json).
        from ml_audio_inpainting_tpu.runtime.longform import (
            longform_inpaint_centered,
        )

        def _long_centered():
            p, s = longform_inpaint_centered(
                fn_enh, variables, long_audio, lg_starts, lg_lens,
                window=80000, batch_size=8,
            )
            return p

        _long_centered()  # compile
        dt_long_c = _measure(_long_centered, iters=5)
        emit(
            "longform_centered_gap_pcm16_audio_seconds_per_sec",
            long_s / dt_long_c,
            "s_audio/s/chip",
            note="single fused program: gap-centered windows + composite + patch fetch",
        )

    if run_serving and not run_all:
        return

    import functools

    from ml_audio_inpainting_tpu.classical.janssen import janssen_gapwise
    from ml_audio_inpainting_tpu.ops import apply_gap, gap_mask, log1p_norm, stft
    from ml_audio_inpainting_tpu.runtime.inference import make_cnn_inpaint_fn
    from ml_audio_inpainting_tpu.train.cnn_trainer import (
        build_model,
        create_cnn_state,
        make_cnn_train_step,
    )

    # CNN family config/state shared by the inference and train lines.
    ccfg = Config()
    ccfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)
    ccfg.data.max_len_s = 5.0
    cmodel = build_model(ccfg)
    cstate = create_cnn_state(ccfg, jax.random.PRNGKey(0))

    if run_all:
        # BASELINE config #1: STFT + gap-mask preprocessing.
        @jax.jit
        def preprocess(a, gs, gl):
            masks = jax.vmap(lambda s, l: gap_mask(a.shape[-1], s, l))(gs, gl)
            spec = stft(apply_gap(a, masks), n_fft=512, hop_length=128, win_length=512)
            return log1p_norm(jnp.abs(spec))

        dt = _measure(lambda: preprocess(audio, gap_start, gap_len), iters=10)
        emit("stft_preprocess_audio_seconds_per_sec", batch * clip_s / dt, "s_audio/s/chip")

        # BASELINE config #2: CNN+BiLSTM inference + iSTFT reconstruction.
        cvars = {"params": cstate.params, "batch_stats": cstate.batch_stats}
        cfn = make_cnn_inpaint_fn(ccfg, cmodel)
        dt = _measure(lambda: cfn(cvars, audio, gap_start, gap_len)[0], iters=10)
        emit("cnn_blstm_inference_audio_seconds_per_sec", batch * clip_s / dt, "s_audio/s/chip")

        # CNN long-form line (VERDICT r4 #5: the longform table was
        # GAN-only): same 60 s / 3-gap condition and levers as the GAN
        # gap-fetch line above.
        from ml_audio_inpainting_tpu.data.dataset import SyntheticSpeechDataset as _SDS
        from ml_audio_inpainting_tpu.runtime.longform import (
            longform_inpaint as _lf,
        )

        _la = jnp.asarray(np.asarray(_SDS(n_items=1, max_len_s=60.0)[0]))
        _lgs, _lgl = np.asarray([200000, 480000, 760000]), np.full(3, 1280)

        def _cnn_long():
            p, s = _lf(
                cfn, cvars, _la, _lgs, _lgl, window=80000, hop=40000,
                batch_size=8, pad_batches=True, gap_fetch=2048,
            )
            np.asarray(s)
            return p

        _cnn_long()  # compile
        dt = _measure(_cnn_long, iters=5)
        emit(
            "longform_cnn_gap_pcm16_audio_seconds_per_sec",
            60.0 / dt,
            "s_audio/s/chip",
            note="CNN family: 60 s clip, 3x80 ms gaps, batch-8 windows + fused epilogue + gap patch fetch",
        )

        # BASELINE config #3: classical AR (gap-wise Janssen) inference.
        tmask = jax.vmap(lambda s, l: gap_mask(audio.shape[-1], s, l))(gap_start, gap_len)
        solver = jax.jit(
            jax.vmap(
                functools.partial(janssen_gapwise, p=256, maxit=5, max_gap=2048)
            )
        )
        dt = _measure(
            lambda: solver(audio * tmask, tmask, gap_start, gap_len), iters=3
        )
        emit("janssen_inference_audio_seconds_per_sec", batch * clip_s / dt, "s_audio/s/chip")

        # Classical AR #2: bidirectional LPC extrapolation in its tuned
        # deployable config (context 8192, sigmoid blend) — the no-oracle
        # gap-SDR champion (+2.84 dB at 80 ms, results/README.md).
        from ml_audio_inpainting_tpu.classical.arinpaint import arinpaint

        ar_solver = jax.jit(
            jax.vmap(
                functools.partial(
                    arinpaint, context=8192, max_gap=2048, blend="sigmoid"
                )
            )
        )
        dt = _measure(
            lambda: ar_solver(audio * tmask, tmask, gap_start, gap_len), iters=3
        )
        emit(
            "arinpaint_inference_audio_seconds_per_sec",
            batch * clip_s / dt,
            "s_audio/s/chip",
            note="tuned deployable config (--ar-preset tuned at 80 ms)",
        )

    # BASELINE config #5: CNN+BiLSTM training throughput, f32 and bf16
    # mixed precision (--train-dtype bf16 for this family, VERDICT r3 #4).
    # The extra bf16 B=128 row is the measured batch-scaling record: the
    # BiLSTM scan is latency-bound (results/profiles/README.md), so batch
    # amortizes the fixed per-scan-step cost — 3868 s-audio/s at B=128 vs
    # 1444 at B=32 in the round-4 study (results/cnn_batch_scaling.json).
    cnn_rows = [("", None, batch), ("_bf16", jnp.bfloat16, batch)]
    if jax.default_backend() != "cpu":
        # Meaningful only where batch amortizes real accelerator dispatch;
        # on the CPU smoke path a 128-clip step just burns minutes.
        cnn_rows.append(("_b128_bf16", jnp.bfloat16, 128))
    for dtype_tag, compute_dtype, cb in cnn_rows:
        caudio = audio if cb == batch else jnp.tile(audio, (-(-cb // batch), 1))[:cb]
        step = make_cnn_train_step(ccfg, compute_dtype=compute_dtype)
        state = cstate

        def one_step():
            nonlocal state
            state, metrics = step(state, caudio, jax.random.PRNGKey(0))
            return metrics["loss"]

        dt = _measure(one_step, iters=5)
        emit(f"cnn_blstm_train_steps_per_sec{dtype_tag}", 1.0 / dt, "steps/s")
        emit(
            f"cnn_blstm_train_audio_seconds_per_sec{dtype_tag}",
            cb * clip_s / dt,
            "s_audio/s/chip",
        )

        # Training-step MFU: the serving MFU above is host-link-bound (the
        # canonical line's caveat); the fused fwd+bwd training step keeps
        # data resident on-device, so its FLOPs/s over chip peak is the
        # honest measure of kernel quality in this environment.
        try:
            compiled = (
                jax.jit(step)
                .lower(state, caudio, jax.random.PRNGKey(0))
                .compile()
            )
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) if ca else 0.0
            peak = PEAK_BF16_FLOPS.get(device_kind)
            if flops > 0 and peak:
                emit(
                    f"cnn_blstm_train_mfu_pct{dtype_tag}",
                    100.0 * flops / dt / peak,
                    "% of bf16 peak",
                )
        except Exception:
            pass

    # GAN two-optimizer train step (flagship family): throughput + MFU at
    # the quality-recipe batch (B=4) and the measured throughput sweet spot
    # (B=16, results/README.md batch-scaling table).
    from ml_audio_inpainting_tpu.train.gan_trainer import (
        create_gan_states,
        make_gan_train_step,
    )

    # Match the production recipe: the default config carries non-zero VGG
    # perceptual/style lambdas and cli/train.py passes vgg19_params(), so the
    # bench must too -- make_gan_train_step(cfg) alone silently drops both
    # VGG terms and over-reports steps/s (round-3 review finding).
    from ml_audio_inpainting_tpu.models.vgg import vgg19_params

    use_vgg = (
        cfg.training.lambda_vgg_perceptual > 0 or cfg.training.lambda_vgg_style > 0
    )
    vgg_pack = vgg19_params() if use_vgg else None
    # f32 at the quality batch and the sweet spot, then bf16 mixed precision
    # (--train-dtype bf16) at the same batches to record the MXU/HBM win.
    # B=32 is the single-chip training record regime (the bench inputs are
    # already device-resident, which is exactly what `--train ... --feed
    # device` provides in production; the old 0.88-1.02 steps/s B=32 record
    # was the STREAMED feed's 10 MB/step host upload, not an HBM spill --
    # XLA memory_analysis puts the full fused step at 9.6 GiB bf16).
    for dtype_tag, compute_dtype in (("", None), ("_bf16", jnp.bfloat16)):
        g_state, d_state = create_gan_states(cfg, jax.random.PRNGKey(0))
        gstep = make_gan_train_step(cfg, vgg=vgg_pack, compute_dtype=compute_dtype)
        for gb in (4, 16, 32):
            if gb > batch:
                continue
            gaudio = audio[:gb]

            def one_gan_step():
                nonlocal g_state, d_state
                g_state, d_state, metrics = gstep(
                    g_state, d_state, gaudio, jax.random.PRNGKey(0)
                )
                return metrics["g_total"]

            dt = _measure(one_gan_step, iters=5)
            emit(f"gan_train_steps_per_sec_b{gb}{dtype_tag}", 1.0 / dt, "steps/s")
            emit(
                f"gan_train_audio_seconds_per_sec_b{gb}{dtype_tag}",
                gb * clip_s / dt,
                "s_audio/s/chip",
            )
            try:
                compiled = (
                    jax.jit(gstep)
                    .lower(g_state, d_state, gaudio, jax.random.PRNGKey(0))
                    .compile()
                )
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get("flops", 0.0)) if ca else 0.0
                peak = PEAK_BF16_FLOPS.get(device_kind)
                if flops > 0 and peak:
                    emit(
                        f"gan_train_mfu_pct_b{gb}{dtype_tag}",
                        100.0 * flops / dt / peak,
                        "% of bf16 peak",
                    )
            except Exception:
                pass

    # End-of-capture link re-probe: a long capture spans enough wall-clock
    # for relay weather to change; pairing a probe at both ends bounds the
    # link state every line above was measured under.
    link_end = _link_probe(jax, jnp)
    emit("link_probe_end", link_end["link_down_mbps"], "MB/s", **link_end)


def _watchdog(seconds: int) -> None:
    """Fail loudly instead of hanging: the axon remote-compile tunnel can go
    down for hours (connection refused / indefinite hangs at first jit —
    CLAUDE.md gotchas), which would otherwise stall the harness forever.
    A daemon timer thread (NOT a signal handler: Python-level handlers only
    run at bytecode boundaries, and the hang sits inside a blocking C++
    PJRT call that never returns to the eval loop) prints a canonical-format
    JSON line with value 0 and a note, then hard-exits."""
    import os
    import threading

    def on_timeout():
        print(
            json.dumps(
                {
                    "metric": "audio_seconds_inpainted_per_sec_per_chip",
                    "value": 0,
                    "unit": "s_audio/s/chip",
                    "vs_baseline": 0,
                    "note": (
                        f"bench watchdog fired after {seconds}s: device "
                        "backend unreachable (axon tunnel outage); see "
                        "results/bench_all_tpu.jsonl for healthy captures"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(2)

    t = threading.Timer(seconds, on_timeout)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    # --all runs many configs (several compiles); the canonical run is one
    # compile + 10 repeats.  Generous bounds: first TPU compile alone can
    # take minutes through the remote-compile tunnel.
    _watchdog(
        3600
        if ("--all" in sys.argv or "--serving" in sys.argv or "--train" in sys.argv)
        else 1800
    )
    main()
