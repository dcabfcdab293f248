"""AR benchmark grid + plots + evaluate CLI + min-support math tests
(CPU, tiny settings)."""

import json
from pathlib import Path

import numpy as np
import pytest

from ml_audio_inpainting_tpu.classical.support import gap_offset, min_sig_supp
from ml_audio_inpainting_tpu.data.audio_io import save_audio


@pytest.fixture
def eval_clips(tmp_path):
    d = tmp_path / "clips"
    d.mkdir()
    t = np.arange(48000) / 16000  # 3 s clips (padded to 5 s by load_audio)
    for i in range(2):
        sig = 0.4 * np.sin(2 * np.pi * (250 + 80 * i) * t).astype(np.float32)
        save_audio(sig, d / f"clip{i}.flac", 16000, normalize=False)
    return d


class TestMinSupport:
    def test_span_covers_gap_with_context(self):
        w, a = 4096, 1024
        s, f = 32000, 33279  # 80 ms gap, 0-based inclusive
        sup = min_sig_supp(w, a, s, f, 80000)
        assert sup.q <= s - 1 and sup.Q >= f + 1
        assert sup.u == s - sup.q and sup.v == f - sup.q
        assert sup.L == sup.Q - sup.q + 1
        assert sup.F >= sup.S

    def test_window_centers_cover_gap(self):
        w, a = 2048, 512
        s, f = 10000, 10500
        sup = min_sig_supp(w, a, s, f, 40000)
        # first useful window must overlap the gap start, last the gap end
        assert sup.p + w // 2 >= s
        assert sup.P - w // 2 <= f

    def test_offset_modes(self):
        s, f, a = 32000, 33279, 1024
        for kind in ("full", "half", "none"):
            off = gap_offset(s, f, a, kind)
            assert abs(off) <= a
        assert gap_offset(s, f, a, "none") == 0
        # 'full' centers a window on the gap center
        c = (s + f + 1) // 2
        off = gap_offset(s, f, a, "full")
        assert (c - off) % a == 0


class TestARBenchmarkCLI:
    def test_tiny_grid_with_resume(self, tmp_path, eval_clips):
        from ml_audio_inpainting_tpu.cli.ar_benchmark import main

        out = tmp_path / "results"
        argv = [
            "--input", str(eval_clips), "--output-dir", str(out),
            "--orders", "32", "--estimators", "lpc",
            "--gap-lens-ms", "40", "--maxit", "2", "--w", "1024", "--a", "256",
        ]
        main(argv)
        files = list(out.glob("results_*.json"))
        assert len(files) == 1
        data = json.loads(files[0].read_text())
        assert set(data["methods"]) == {
            "extrapolation", "janssen", "janssen_hann", "janssen_rect", "janssen_tukey",
        }
        for m in data["methods"].values():
            assert len(m["gap_sdr_db"]) == 2
            assert all(np.isfinite(m["gap_sdr_db"]))
        assert len(data["methods"]["janssen"]["gap_sdr_per_iter_db"][0]) == 2

        # resume: second run skips
        mtime = files[0].stat().st_mtime
        main(argv)
        assert files[0].stat().st_mtime == mtime

    def test_plots(self, tmp_path, eval_clips):
        from ml_audio_inpainting_tpu.cli.ar_benchmark import main as bench_main
        from ml_audio_inpainting_tpu.cli.ar_plots import main as plot_main

        out = tmp_path / "results"
        bench_main(
            [
                "--input", str(eval_clips), "--output-dir", str(out),
                "--orders", "32", "--estimators", "lpc",
                "--gap-lens-ms", "40", "--maxit", "2", "--w", "1024", "--a", "256",
            ]
        )
        png = tmp_path / "plot.png"
        plot_main(
            ["--results-dir", str(out), "--output", str(png), "--per-iteration"]
        )
        assert png.exists() and png.stat().st_size > 1000
        assert png.with_suffix(".iters.png").exists()


class TestEvaluateCLI:
    def test_classical_eval_json(self, tmp_path, eval_clips):
        from ml_audio_inpainting_tpu.cli.evaluate import main

        out_json = tmp_path / "cmp.json"
        recon = tmp_path / "recon"
        main(
            [
                "--models", "arinpaint",
                "--input", str(eval_clips),
                "--output-json", str(out_json),
                "--reconstructions", str(recon),
                "--gap-len", "0.04", "--ar-order", "64", "--maxit", "2",
            ]
        )
        data = json.loads(out_json.read_text())
        assert "arinpaint" in data["results"]
        assert len(data["results"]["arinpaint"]["gap_sdr_db"]) == 2
        flacs = list(recon.glob("*arinpaint_inpainted.flac"))
        assert len(flacs) == 2

    def test_multigap_eval(self, tmp_path, eval_clips):
        """IRMAS-style multi-gap condition (--n-gaps, IRMAS_gaps.m):
        sequential per-gap solving must improve on leaving the gaps silent."""
        from ml_audio_inpainting_tpu.cli.evaluate import main

        out_json = tmp_path / "mg.json"
        main(
            [
                "--models", "arinpaint",
                "--input", str(eval_clips),
                "--output-json", str(out_json),
                "--n-gaps", "3",
                "--gap-len", "0.04", "--ar-order", "64",
            ]
        )
        data = json.loads(out_json.read_text())
        assert data["condition"]["n_gaps"] == 3
        sdrs = data["results"]["arinpaint"]["gap_sdr_db"]
        assert len(sdrs) == 2
        # zero-fill scores exactly 0 dB; solving all gaps must beat it
        assert all(np.isfinite(v) for v in sdrs)
        assert float(np.mean(sdrs)) > 0.0, sdrs
