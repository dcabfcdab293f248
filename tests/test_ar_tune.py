"""cli/ar_tune.py -- per-condition probe tuning of the classical solvers."""

import json

import numpy as np

from ml_audio_inpainting_tpu.data.audio_io import save_audio


def _make_clips(d, n=2, seconds=4.0, sr=16000):
    d.mkdir(exist_ok=True)
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n):
        sig = (0.4 * np.sin(2 * np.pi * (220 + 60 * i) * t)
               + 0.1 * np.sin(2 * np.pi * (880 + 30 * i) * t)).astype(np.float32)
        save_audio(sig, d / f"p{i}.flac", sr, normalize=False)


class TestArTune:
    def test_sweep_selects_and_reports(self, tmp_path):
        from ml_audio_inpainting_tpu.cli.ar_tune import main

        probe_dir = tmp_path / "probe"
        _make_clips(probe_dir)
        out = tmp_path / "tune.json"
        main([
            "--model", "arinpaint", "--gap-len", "0.04",
            "--probe-dir", str(probe_dir), "--probe-positions", "1.0", "2.0",
            "--contexts", "1024", "2048", "--orders", "64",
            "--blends", "cos2", "sigmoid:2",
            "--output-json", str(out),
        ])
        d = json.loads(out.read_text())
        assert len(d["grid"]) == 4
        probes = [r["probe_mean_db"] for r in d["grid"]]
        assert d["probe_best"]["probe_mean_db"] == max(probes)
        # winner carries the full solver config
        assert {"ar_context", "ar_order", "ar_blend"} <= set(d["probe_best"])

    def test_janssen_grid_uses_maxit(self, tmp_path):
        from ml_audio_inpainting_tpu.cli.ar_tune import main

        probe_dir = tmp_path / "probe"
        _make_clips(probe_dir, n=1)
        out = tmp_path / "tune.json"
        main([
            "--model", "janssen", "--gap-len", "0.04",
            "--probe-dir", str(probe_dir), "--probe-positions", "1.5",
            "--contexts", "1024", "--orders", "64", "--maxits", "1", "2",
            "--output-json", str(out),
        ])
        d = json.loads(out.read_text())
        assert sorted(r["maxit"] for r in d["grid"]) == [1, 2]
