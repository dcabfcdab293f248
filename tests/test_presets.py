"""Measured per-condition classical presets (classical/presets.py).

The ``tuned`` preset hard-codes the probe-selected champion configs from
``results/ar_tuned_per_length.json`` (cli/ar_tune.py protocol); these tests
pin the tables to the recorded winners and check the CLI plumbing applies
them to the solver args.
"""

import argparse

import jax.numpy as jnp
import numpy as np

from ml_audio_inpainting_tpu.classical.presets import (
    tuned_arinpaint_preset,
    tuned_janssen_preset,
)


class TestPresetTables:
    def test_40ms_winner(self):
        p = tuned_arinpaint_preset(0.04)
        assert p == {
            "ar_order": 256,
            "ar_context": 4096,
            "ar_blend": "linear",
            "ar_blend_param": 0.2,
        }

    def test_80ms_winner(self):
        p = tuned_arinpaint_preset(0.08)
        assert p == {
            "ar_order": 512,
            "ar_context": 8192,
            "ar_blend": "sigmoid",
            "ar_blend_param": 2.0,
        }

    def test_long_gaps_get_probe_pairwise_winner(self):
        # >=120 ms: the 40 ms config, preferred over defaults by the
        # pairwise probe at every measured length (round-4 boundary
        # probes, results/ar_tuned_gl0.{06,12,24}.json + per-length rows).
        expect = {
            "ar_order": 256,
            "ar_context": 4096,
            "ar_blend": "linear",
            "ar_blend_param": 0.2,
        }
        assert tuned_arinpaint_preset(0.12) == expect
        assert tuned_arinpaint_preset(0.16) == expect
        assert tuned_arinpaint_preset(0.24) == expect
        assert tuned_arinpaint_preset(0.5) == expect

    def test_boundary_routing(self):
        """Round-4/5 measured boundary probes pin the routing: 60 and
        70 ms -> the 40 ms config (near-oracle at both: 3.649 @ 60,
        3.412 = the grid oracle @ 70 vs the 80 ms config's 3.234 --
        ar_tuned_gl0.07.json); the 80 ms config holds only its own
        measured point (at 100 ms it already regresses below defaults,
        2.965 vs 3.076 -- ar_tuned_gl0.10.json; at 120 ms 2.711 vs
        2.881).  Band = (0.075, 0.09], midpoints of measured lengths."""
        assert tuned_arinpaint_preset(0.06)["ar_context"] == 4096
        assert tuned_arinpaint_preset(0.07)["ar_context"] == 4096
        assert tuned_arinpaint_preset(0.075)["ar_context"] == 4096
        assert tuned_arinpaint_preset(0.08)["ar_context"] == 8192
        assert tuned_arinpaint_preset(0.09)["ar_context"] == 8192
        assert tuned_arinpaint_preset(0.10)["ar_context"] == 4096
        assert tuned_arinpaint_preset(0.12)["ar_context"] == 4096

    def test_janssen_short_champion(self):
        assert tuned_janssen_preset(0.08) == {"ar_context": 8192, "maxit": 5}
        assert tuned_janssen_preset(0.16) == {"ar_context": 8192, "maxit": 5}
        assert tuned_janssen_preset(0.18) == {"ar_context": 8192, "maxit": 5}

    def test_janssen_long_context_band(self):
        """Round-4 240 ms winner + round-5 measured edges
        (janssen_tuned_gl0.{20,28}.json): ctx 16384/maxit 5 wins on eval
        at 200 ms (2.582 vs 8192's 2.010), 240 ms (1.124 vs defaults
        0.797) and 280 ms (2.207 vs 2.165) -> band (0.18, 0.30],
        midpoints of measured lengths."""
        expect = {"ar_context": 16384, "maxit": 5}
        assert tuned_janssen_preset(0.20) == expect
        assert tuned_janssen_preset(0.24) == expect
        assert tuned_janssen_preset(0.28) == expect
        assert tuned_janssen_preset(0.30) == expect
        # 320 ms grid (janssen_tuned_gl0.32.json): 16384 wins +0.79 dB
        # over defaults (1.973 vs 1.188) -> band extends to the 320/500
        # midpoint 0.41.
        assert tuned_janssen_preset(0.32) == expect
        assert tuned_janssen_preset(0.41) == expect
        assert tuned_janssen_preset(0.42) == {}
        assert tuned_janssen_preset(0.50) == {}


def _cli_args(model: str, gap_len: float, preset: str) -> argparse.Namespace:
    from ml_audio_inpainting_tpu.cli.inpaint import build_argparser

    args = build_argparser().parse_args(
        ["--model", model, "--input", "unused", "--output", "unused",
         "--gap-len", str(gap_len), "--ar-preset", preset]
    )
    return args


class TestRunnerPlumbing:
    def test_tuned_overrides_args_and_solves(self):
        from ml_audio_inpainting_tpu.cli.inpaint import _build_runner
        from ml_audio_inpainting_tpu.utils.config import Config

        cfg = Config()
        args = _cli_args("arinpaint", 0.04, "tuned")
        runner = _build_runner(args, cfg, n_samples=16000)
        assert args.ar_order == 256 and args.ar_blend == "linear"
        assert args.ar_blend_param == 0.2

        # The tuned runner must actually reconstruct a sinusoid's gap.
        t = np.arange(16000) / 16000.0
        clean = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)[None]
        gs = jnp.asarray([8000], jnp.int32)
        gl = jnp.asarray([640], jnp.int32)  # 40 ms
        out = np.asarray(runner(jnp.asarray(clean), gs, gl))
        gap = slice(8000, 8640)
        err = clean[0, gap] - out[0, gap]
        sdr = 10 * np.log10(
            np.sum(clean[0, gap] ** 2) / max(np.sum(err**2), 1e-12)
        )
        assert sdr > 10.0  # a stationary tone is easy for AR extrapolation

    def test_default_preset_is_a_noop(self):
        from ml_audio_inpainting_tpu.cli.inpaint import _build_runner
        from ml_audio_inpainting_tpu.utils.config import Config

        args = _cli_args("arinpaint", 0.04, "default")
        _build_runner(args, Config(), n_samples=16000)
        assert args.ar_order == 512 and args.ar_blend == "cos2"

    def test_tuned_leaves_long_gap_args_alone(self):
        # Past the last measured grid length (0.41 band edge after the
        # round-5 320 ms grid) the tuned preset must not touch the args.
        from ml_audio_inpainting_tpu.cli.inpaint import _build_runner
        from ml_audio_inpainting_tpu.utils.config import Config

        args = _cli_args("janssen", 0.5, "tuned")
        _build_runner(args, Config(), n_samples=16000)
        assert args.maxit == 10 and args.ar_context == 4096

        # And inside the band it overrides (320 ms: +0.79 dB measured win).
        args = _cli_args("janssen", 0.32, "tuned")
        _build_runner(args, Config(), n_samples=16000)
        assert args.maxit == 5 and args.ar_context == 16384
