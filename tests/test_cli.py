"""CLI smoke tests: train a few steps on synthetic data, preprocess a tiny
corpus, inpaint with a classical solver -- all through the real entry points."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

from ml_audio_inpainting_tpu.data.audio_io import read_audio, save_audio


@pytest.fixture
def tiny_corpus(tmp_path, rng):
    root = tmp_path / "corpus" / "train"
    root.mkdir(parents=True)
    t = np.arange(16000) / 16000
    for i in range(3):
        sig = 0.5 * np.sin(2 * np.pi * (300 + 100 * i) * t).astype(np.float32)
        save_audio(sig, root / f"clip{i}.flac", 16000, normalize=False)
    return root


def small_cfg_yaml(tmp_path, model: str) -> Path:
    cfg = {
        "data": {
            "sample_rate": 16000,
            "max_len_s": 1.0,
            "gap_len_s": 0.1,
            "gaps_per_audio": 2,
            "spectrogram": (
                {"n_fft": 512, "hop_length": 128, "win_length": 512}
                if model == "gan"
                else {"n_fft": 512, "hop_length": 192, "win_length": 384}
            ),
        },
        "model": (
            {
                "generator": {},
                "discriminator": {},
            }
            if model == "gan"
            else {
                "in_channels": 1,
                "num_lstm_layers": 1,
                "lstm_hidden_dim": 32,
                "enc_filters": [4, 8],
                "dec_filters": [4, 8],
            }
        ),
        "training": {
            "batch_size": 2,
            "epochs": 5,
            "max_n_epochs": 5,
            "lambda_vgg_perceptual": 0.0,
            "lambda_vgg_style": 0.0,
        },
        "logging": {
            "metric_interval": 1,
            "log_interval": 1,
            "checkpoint_interval": 1,
            "sample_interval": 2,
        },
    }
    if model == "gan":
        cfg["model"]["generator"] = {
            "enc_layer_cfg": [[8, 7, 2], [16, 5, 2], [16, 3, 2]],
            "dec_layer_cfg": [[16, 3, 1], [8, 3, 1]],
            "final_interim_ch": 8,
        }
        cfg["model"]["discriminator"] = {"layer_cfg": [[8, 2], [16, 2]]}
    import yaml

    p = tmp_path / f"{model}.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


class TestTrainCLI:
    def test_cnn_synthetic_short_run(self, tmp_path):
        from ml_audio_inpainting_tpu.cli.train import main

        cfg_path = small_cfg_yaml(tmp_path, "cnn_blstm")
        main(
            [
                "--model", "cnn_blstm", "--config", str(cfg_path),
                "--synthetic", "4", "--steps", "3",
                "--base-dir", str(tmp_path), "--run-name", "t",
            ]
        )
        ckpts = list((tmp_path / "checkpoints").rglob("*"))
        assert any(p.is_dir() for p in ckpts)
        logs = list((tmp_path / "logs").glob("*.log"))
        assert logs and "step 3" in logs[0].read_text()

    def test_cnn_probe_best_checkpoint(self, tmp_path):
        """--probe-every scores a held-out gap-SDR probe and keeps the best
        checkpoint under checkpoints/<run>/best."""
        from ml_audio_inpainting_tpu.cli.train import main

        cfg_path = small_cfg_yaml(tmp_path, "cnn_blstm")
        main(
            [
                "--model", "cnn_blstm", "--config", str(cfg_path),
                "--synthetic", "4", "--steps", "4",
                "--probe-every", "2", "--probe-clips", "1", "--probe-patience", "5",
                "--base-dir", str(tmp_path), "--run-name", "p",
            ]
        )
        logs = list((tmp_path / "logs").glob("*.log"))
        text = logs[0].read_text()
        assert "new best" in text and "best probe checkpoint" in text
        best = list((tmp_path / "checkpoints").rglob("best"))
        assert best and any(best[0].iterdir()), "best checkpoint not written"
        # End-of-training auto-export: the probe-best inference weights land
        # as a compact npz accepted by evaluate/inpaint --checkpoint.
        npz = list((tmp_path / "checkpoints").rglob("best_inference.npz"))
        assert npz, "probe-best npz not exported"
        from ml_audio_inpainting_tpu.train.checkpoints import load_params_npz

        variables = load_params_npz(npz[0])
        assert "params" in variables

    def test_resume_from_prior_run_dir(self, tmp_path):
        """--resume-from restores the latest step of ANOTHER run's orbax dir
        (run dirs are timestamped, so plain --resume cannot see them) and
        continues counting from there into the new run's own dir."""
        from ml_audio_inpainting_tpu.cli.train import main

        cfg_path = small_cfg_yaml(tmp_path, "cnn_blstm")
        base = ["--model", "cnn_blstm", "--config", str(cfg_path),
                "--synthetic", "4", "--base-dir", str(tmp_path)]
        main(base + ["--steps", "2", "--run-name", "first"])
        first = next((tmp_path / "checkpoints").glob("first_*"))
        main(base + ["--steps", "5", "--run-name", "second",
                     "--resume-from", str(first)])
        logs = {p.name: p.read_text() for p in (tmp_path / "logs").glob("second_*.log")}
        text = "".join(logs.values())
        assert "resumed from step 2" in text
        assert "training done at step 5" in text
        # The continuation saved into its own dir, not the source run's.
        second = next((tmp_path / "checkpoints").glob("second_*"))
        assert any(second.iterdir())

    def test_resume_from_missing_dir_fails_loudly(self, tmp_path):
        import pytest

        from ml_audio_inpainting_tpu.cli.train import main

        cfg_path = small_cfg_yaml(tmp_path, "cnn_blstm")
        with pytest.raises(SystemExit, match="no checkpoint found"):
            main(["--model", "cnn_blstm", "--config", str(cfg_path),
                  "--synthetic", "4", "--steps", "2",
                  "--base-dir", str(tmp_path), "--run-name", "x",
                  "--resume-from", str(tmp_path / "nonexistent")])

    def test_train_gap_len_and_probe_gap_len(self, tmp_path):
        """--train-gap-len overrides the training corruption length and
        --probe-gap-len the held-out probe condition (long-gap recipe)."""
        from ml_audio_inpainting_tpu.cli.train import main

        cfg_path = small_cfg_yaml(tmp_path, "cnn_blstm")
        main(
            [
                "--model", "cnn_blstm", "--config", str(cfg_path),
                "--synthetic", "4", "--steps", "2",
                "--train-n-gaps", "2", "--train-gap-len", "0.12",
                "--probe-every", "2", "--probe-clips", "1",
                "--probe-gap-len", "0.12",
                "--base-dir", str(tmp_path), "--run-name", "lg",
            ]
        )
        logs = list((tmp_path / "logs").glob("*.log"))
        text = logs[0].read_text()
        assert "gap_len_s: 0.12" in text  # config dump reflects the override
        assert "probe @ step" in text

    def test_probe_dir_real_clip_selection(self, tmp_path):
        """--probe-dir selects the best checkpoint on real clips (each
        replicated at --probe-positions) instead of held-out synthetic."""
        from ml_audio_inpainting_tpu.cli.train import main

        probe_dir = tmp_path / "probe"
        probe_dir.mkdir()
        t = np.arange(16000) / 16000
        for i in range(2):
            sig = 0.4 * np.sin(2 * np.pi * (250 + 80 * i) * t).astype(np.float32)
            save_audio(sig, probe_dir / f"p{i}.flac", 16000, normalize=False)

        cfg_path = small_cfg_yaml(tmp_path, "cnn_blstm")
        main(
            [
                "--model", "cnn_blstm", "--config", str(cfg_path),
                "--synthetic", "4", "--steps", "4",
                "--probe-every", "2", "--probe-patience", "5",
                "--probe-dir", str(probe_dir),
                "--probe-positions", "0.3", "0.6",
                "--base-dir", str(tmp_path), "--run-name", "rp",
            ]
        )
        logs = list((tmp_path / "logs").glob("*.log"))
        text = logs[0].read_text()
        assert "real probe: 2 clips x 2 positions" in text
        assert "probe @ step" in text
        best = list((tmp_path / "checkpoints").rglob("best"))
        assert best and any(best[0].iterdir()), "best checkpoint not written"

    def test_gan_synthetic_short_run(self, tmp_path):
        from ml_audio_inpainting_tpu.cli.train import main

        cfg_path = small_cfg_yaml(tmp_path, "gan")
        main(
            [
                "--model", "gan", "--config", str(cfg_path),
                "--synthetic", "4", "--steps", "2",
                # bf16 here covers the --train-dtype CLI plumbing; the
                # f32/bf16 step equivalence itself is pinned in test_gan.py.
                "--train-dtype", "bf16",
                # probe on to cover the GAN branch of the probe-best npz
                # export (the CNN branch is pinned above).
                "--probe-every", "2", "--probe-clips", "1",
                "--base-dir", str(tmp_path), "--run-name", "g",
            ]
        )
        logs = list((tmp_path / "logs").glob("*.log"))
        assert logs and "g_total" in logs[0].read_text()
        samples = list((tmp_path / "samples").rglob("*.flac"))
        assert samples, "sample dump did not produce audio"
        npz = list((tmp_path / "checkpoints").rglob("best_inference.npz"))
        assert npz, "GAN probe-best npz not exported"
        from ml_audio_inpainting_tpu.train.checkpoints import load_params_npz

        variables = load_params_npz(npz[0])
        assert "params" in variables  # generator inference vars only


class TestPreprocessCLI:
    def test_mirror_tree_with_gaps(self, tmp_path, tiny_corpus):
        from ml_audio_inpainting_tpu.cli.preprocess import main

        out = tmp_path / "processed"
        main(
            [
                "--input", str(tiny_corpus), "--output", str(out),
                "--gap-len", "0.1", "--gap-start", "0.5", "--max-len", "1.0",
            ]
        )
        outs = sorted(out.rglob("*.flac"))
        assert len(outs) == 3
        audio, rate, _ = read_audio(outs[0])
        assert rate == 16000
        seg = audio[8000 : 8000 + 1600, 0]
        assert np.all(seg == 0.0)  # the gap
        assert np.any(audio[:8000, 0] != 0.0)


class TestInpaintCLI:
    def test_classical_inpaint_file(self, tmp_path, tiny_corpus):
        from ml_audio_inpainting_tpu.cli.inpaint import main

        src = next(iter(sorted(tiny_corpus.glob("*.flac"))))
        out = tmp_path / "restored.flac"
        main(
            [
                "--model", "janssen", "--input", str(src), "--output", str(out),
                "--gap-start", "0.4", "--gap-len", "0.05",
                "--ar-order", "64", "--maxit", "3",
            ]
        )
        audio, rate, md5 = read_audio(out)
        assert rate == 16000 and md5 == 1
        # the gap region should NOT be silent after inpainting a pure tone
        seg = audio[int(0.41 * 16000) : int(0.44 * 16000), 0]
        assert np.max(np.abs(seg)) > 0.01

    def test_arinpaint_context_flag(self, tmp_path, tiny_corpus):
        """--ar-context reaches arinpaint: different contexts give different
        fills (results/ar_context_sweep.json's 8192 setting is reachable)."""
        from ml_audio_inpainting_tpu.cli.inpaint import main

        src = next(iter(sorted(tiny_corpus.glob("*.flac"))))
        outs = []
        for ctx in (1024, 4096):
            out = tmp_path / f"ar_{ctx}.flac"
            main(
                [
                    "--model", "arinpaint", "--input", str(src),
                    "--output", str(out),
                    "--gap-start", "0.4", "--gap-len", "0.05",
                    "--ar-order", "64", "--ar-context", str(ctx),
                ]
            )
            audio, rate, _ = read_audio(out)
            assert rate == 16000
            outs.append(audio[int(0.4 * 16000) : int(0.45 * 16000), 0])
        assert np.max(np.abs(outs[0])) > 1e-4  # gap filled
        assert not np.allclose(outs[0], outs[1])  # context changed the fit


class TestLearnedSpainCLI:
    def test_aspain_learned_inpaint(self, tmp_path, tiny_corpus):
        from ml_audio_inpainting_tpu.cli.inpaint import main

        src = next(iter(sorted(tiny_corpus.glob("*.flac"))))
        out = tmp_path / "sp.flac"
        main(
            [
                "--model", "aspain_learned", "--input", str(src), "--output", str(out),
                "--gap-start", "0.4", "--gap-len", "0.05", "--maxit", "30",
            ]
        )
        from ml_audio_inpainting_tpu.data.audio_io import read_audio

        audio, rate, _ = read_audio(out)
        assert rate == 16000
        seg = audio[int(0.41 * 16000) : int(0.44 * 16000), 0]
        assert np.max(np.abs(seg)) > 0.01  # gap filled


class TestInferDtype:
    def test_bf16_rejected_for_non_gan(self, tmp_path, tiny_corpus):
        """--infer-dtype bf16 is a GAN-generator feature; other models must
        refuse loudly rather than silently serve f32."""
        from ml_audio_inpainting_tpu.cli.inpaint import main

        clip = next(tiny_corpus.rglob("*.flac"))
        with pytest.raises(SystemExit, match="gan only"):
            main([
                "--model", "janssen", "--infer-dtype", "bf16",
                "--input", str(clip), "--output", str(tmp_path / "o.flac"),
            ])


class TestRealProbeLoader:
    def test_load_real_probe_set_clamps(self, tiny_corpus):
        """Shared --probe-dir loader (data/probe.py): replication order is
        clip-major, and positions past a short clip clamp so the gap fits."""
        from ml_audio_inpainting_tpu.data.probe import load_real_probe_set

        clips, starts, n_files = load_real_probe_set(
            tiny_corpus, positions=[0.25, 5.0], sample_rate=16000,
            max_len_s=1.0, gap_len_s=0.08,
        )
        assert n_files == 3
        assert clips.shape == (6, 16000)
        assert starts.dtype == np.int32
        # position 0.25 s passes through; 5 s clamps inside the 1 s clip
        gl = int(0.08 * 16000)
        assert starts[0] == int(0.25 * 16000)
        assert starts[1] == 16000 - gl - 1
        assert np.all(starts + gl < clips.shape[-1])
        # clip-major replication: rows 0,1 are the same clip at 2 positions
        assert np.allclose(clips[0], clips[1])
        assert not np.allclose(clips[0], clips[2])
        with pytest.raises(FileNotFoundError):
            load_real_probe_set(tiny_corpus / "nope", [1.0], 16000, 1.0)
