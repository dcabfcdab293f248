"""The reference's own YAML configs must load through this framework's
Config unchanged (README parity claim; SURVEY.md §5.6)."""

import os

import pytest

from ml_audio_inpainting_tpu.utils.config import load_config

GAN_YAML = "/root/reference/models/GAN/config.yaml"
CNN_YAML = "/root/reference/models/CNNBLSTM/cnn_blstm.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GAN_YAML), reason="reference not mounted"
)


class TestReferenceYAMLs:
    def test_gan_config_loads(self):
        cfg = load_config(GAN_YAML)
        # Spectrogram profile (config.yaml:12-15)
        assert cfg.data.spectrogram.n_fft == 512
        assert cfg.data.spectrogram.hop_length == 128
        assert cfg.data.spectrogram.win_length == 512
        # Data contract (config.yaml:8-10)
        assert cfg.data.max_len_s == 5.0
        assert cfg.data.gap_len_s == 0.2
        assert cfg.data.train_limit == 3000
        # Training + loss weights (config.yaml:31-44)
        assert cfg.training.batch_size == 8
        assert cfg.training.g_lr == 2e-4 and cfg.training.b1 == 0.5
        assert cfg.training.lambda_adv == 0.01
        assert cfg.training.lambda_l1_hole == 2.0
        assert cfg.training.lambda_vgg_style == 500.0
        assert cfg.training.lambda_mag_weighted == 0.2
        # Resume block (config.yaml:45-47)
        assert cfg.training.resume_from_chkpt is True
        assert cfg.training.resume_epoch == 45
        # Logging intervals (config.yaml:56-61)
        assert cfg.logging.log_interval == 100
        assert cfg.logging.checkpoint_interval == 5
        assert cfg.logging.sample_interval == 500

    def test_cnn_config_loads(self):
        cfg = load_config(CNN_YAML)
        # Spectrogram profile (cnn_blstm.yaml:15-18)
        assert cfg.data.spectrogram.n_fft == 512
        assert cfg.data.spectrogram.hop_length == 192
        assert cfg.data.spectrogram.win_length == 384
        # Dataset recipe (cnn_blstm.yaml:12-13)
        assert cfg.data.n_files == 100
        assert cfg.data.gaps_per_audio == 25
        # Model (cnn_blstm.yaml:23-29)
        m = cfg.model.cnn_blstm
        assert m.in_channels == 1
        assert m.num_lstm_layers == 3
        assert m.lstm_hidden_dim == 128
        assert m.enc_filters == [16, 32] and m.dec_filters == [16, 32]
        # Optimizer (cnn_blstm.yaml:32-37)
        assert cfg.training.batch_size == 1
        assert cfg.training.starter_learning_rate == 1e-4
        assert cfg.training.max_n_epochs == 50
        # Derived shapes match the contract (SURVEY.md §2.7)
        assert cfg.data.spectrogram.freq_bins == 257
        assert cfg.data.spectrogram.frames(cfg.data.max_samples) == 417

    def test_gan_derived_shapes(self):
        cfg = load_config(GAN_YAML)
        assert cfg.data.spectrogram.freq_bins == 257
        assert cfg.data.spectrogram.frames(cfg.data.max_samples) == 626
