"""Typed configuration tree with reference-compatible YAML loading.

The reference scatters config across three mechanisms (SURVEY.md §5.6): a
constants module (``config.py``), per-model YAML files with a ``yaml.safe_load``
helper duplicated in three places, and MATLAB script-top variables.  Here one
typed dataclass tree serializes to/from YAML, *preserving the reference's key
names* so that ``models/GAN/config.yaml`` and ``models/CNNBLSTM/cnn_blstm.yaml``
remain directly loadable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import yaml

__all__ = [
    "SpectrogramConfig",
    "DataConfig",
    "GeneratorConfig",
    "DiscriminatorConfig",
    "CNNBLSTMConfig",
    "ModelConfig",
    "TrainingConfig",
    "PathsConfig",
    "LoggingConfig",
    "MeshConfig",
    "Config",
    "load_config",
    "gan_profile_config",
    "DEFAULT_SAMPLE_RATE",
    "DEFAULT_N_FFT",
    "DEFAULT_HANN_WINDOW_SIZE",
    "DEFAULT_HANN_HOP_LENGTH",
    "DEFAULT_GAP_START_TIME",
    "DEFAULT_GAP_DURATION",
    "SUPPORTED_FORMATS",
]

# Global DSP constants (reference config.py:27-36).
DEFAULT_SAMPLE_RATE = 16000
DEFAULT_N_FFT = 512
DEFAULT_HANN_WINDOW_SIZE = 384  # 24 ms at 16 kHz
DEFAULT_HANN_HOP_LENGTH = 192  # 12 ms
DEFAULT_GAP_START_TIME = 2.0
DEFAULT_GAP_DURATION = 0.5
SUPPORTED_FORMATS = [".flac", ".wav", ".mp3"]


def _filtered(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass(frozen=True)
class SpectrogramConfig:
    """STFT profile (reference ``config.yaml:11-17`` / ``cnn_blstm.yaml:14-20``).

    Frozen/hashable so it can be a static argument to jitted feature
    extraction."""

    n_fft: int = DEFAULT_N_FFT
    hop_length: int = DEFAULT_HANN_HOP_LENGTH
    win_length: int = DEFAULT_HANN_WINDOW_SIZE
    window: str = "hann"
    normalize: bool = True
    power: float = 1.0

    @property
    def freq_bins(self) -> int:
        return self.n_fft // 2 + 1

    def frames(self, n_samples: int) -> int:
        return 1 + n_samples // self.hop_length


@dataclass
class DataConfig:
    dataset: str = "LibriSpeech"
    root_path: str = ""
    sample_rate: int = DEFAULT_SAMPLE_RATE
    train_path: str = "train-clean-100"
    valid_path: str = "dev-clean"
    test_path: str = "test-clean"
    max_len_s: float = 5.0
    gap_len_s: float = 0.2
    train_limit: Optional[int] = None  # GAN: random subset cap (config.yaml:10)
    n_files: Optional[int] = None  # CNNBLSTM: file cap (cnn_blstm.yaml:12)
    gaps_per_audio: int = 1  # CNNBLSTM: gap variants per clip (cnn_blstm.yaml:13)
    # Training-time multi-gap corruption (enhancement over the reference's
    # single random gap; matches the IRMAS eval condition, IRMAS_gaps.m).
    train_n_gaps: int = 1
    spectrogram: SpectrogramConfig = field(default_factory=SpectrogramConfig)

    @property
    def max_samples(self) -> int:
        return int(self.sample_rate * self.max_len_s)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DataConfig":
        d = dict(d)
        spec = d.pop("spectrogram", {})
        cfg = cls(**_filtered(cls, d))
        cfg.spectrogram = SpectrogramConfig(**_filtered(SpectrogramConfig, spec))
        return cfg


@dataclass
class GeneratorConfig:
    """PConv U-Net generator (reference ``config.yaml:20-24``)."""

    input_channels: int = 1
    mask_channels: int = 1
    output_channels: int = 1
    # (out_channels, kernel, stride) per encoder stage -- networks.py:179-182.
    enc_layer_cfg: List[Tuple[int, int, int]] = field(
        default_factory=lambda: [
            (64, 7, 2),
            (128, 5, 2),
            (256, 5, 2),
            (512, 3, 2),
            (512, 3, 2),
            (512, 3, 2),
            (512, 3, 2),
        ]
    )
    dec_layer_cfg: List[Tuple[int, int, int]] = field(
        default_factory=lambda: [
            (512, 3, 1),
            (512, 3, 1),
            (512, 3, 1),
            (256, 3, 1),
            (128, 3, 1),
            (64, 3, 1),
        ]
    )
    final_interim_ch: int = 64
    final_kernel: int = 3


@dataclass
class DiscriminatorConfig:
    """Spectral-norm PatchGAN (reference ``config.yaml:25-28``)."""

    input_channels: int = 1
    # (out_channels, stride) per block -- networks.py:380-407.
    layer_cfg: List[Tuple[int, int]] = field(
        default_factory=lambda: [(64, 2), (128, 2), (256, 2), (512, 1)]
    )
    kernel_size: int = 4
    use_spectral_norm: bool = True


@dataclass
class CNNBLSTMConfig:
    """CNN + BiLSTM bottleneck (reference ``cnn_blstm.yaml:23-29``)."""

    in_channels: int = 1
    num_lstm_layers: int = 3
    lstm_hidden_dim: int = 128
    enc_filters: List[int] = field(default_factory=lambda: [16, 32])
    dec_filters: List[int] = field(default_factory=lambda: [16, 32])


@dataclass
class ModelConfig:
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    cnn_blstm: CNNBLSTMConfig = field(default_factory=CNNBLSTMConfig)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        cfg = cls()
        if "generator" in d:
            g = dict(d["generator"])
            g.pop("channels", None)  # informational in the reference YAML
            cfg.generator = GeneratorConfig(**_filtered(GeneratorConfig, g))
        if "discriminator" in d:
            dd = dict(d["discriminator"])
            dd.pop("channels", None)
            dd.pop("use_spectral_norm", None)
            cfg.discriminator = DiscriminatorConfig(**_filtered(DiscriminatorConfig, dd))
        # CNNBLSTM reference keeps model keys at the top level of `model:`.
        cnn_keys = _filtered(CNNBLSTMConfig, d)
        if cnn_keys:
            cfg.cnn_blstm = CNNBLSTMConfig(**cnn_keys)
        return cfg


@dataclass
class TrainingConfig:
    batch_size: int = 8
    epochs: int = 100
    # GAN optimizers (config.yaml:34-37)
    g_lr: float = 2e-4
    d_lr: float = 2e-4
    b1: float = 0.5
    b2: float = 0.999
    # Loss weights (config.yaml:39-44)
    lambda_adv: float = 0.01
    lambda_l1_valid: float = 1.0
    lambda_l1_hole: float = 2.0
    lambda_vgg_perceptual: float = 4.0
    lambda_vgg_style: float = 500.0
    lambda_mag_weighted: float = 0.2
    # CNNBLSTM optimizer (cnn_blstm.yaml:32-37)
    optimizer_type: str = "adam"
    starter_learning_rate: float = 1e-4
    lr_decay: float = 1.0
    max_n_epochs: int = 50
    # Resume (config.yaml:45-47)
    resume_from_chkpt: bool = False
    resume_run_name: Optional[str] = None
    resume_epoch: Optional[int] = None


@dataclass
class PathsConfig:
    tensorboard_dir: str = "./tensorboard"
    checkpoint_dir: str = "./checkpoints"
    log_dir: str = "./logs"
    sample_dir: str = "./samples"
    resume_mdl_path: Optional[str] = None


@dataclass
class LoggingConfig:
    log_interval: int = 100
    checkpoint_interval: int = 5
    sample_interval: int = 500
    metric_interval: int = 25
    spectrogram_interval: int = 100
    audio_interval: int = 500
    num_workers: int = 4
    run_name: str = "run"


@dataclass
class MeshConfig:
    """Device-mesh layout -- new in the TPU framework (SURVEY.md §2.6).

    ``data`` shards the batch; ``model`` is reserved for tensor-parallel
    sharding of the BiLSTM/conv weights on larger configs.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1: use all devices
    model_parallel: int = 1


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        cfg = cls()
        if "data" in d:
            cfg.data = DataConfig.from_dict(d["data"])
        if "model" in d:
            cfg.model = ModelConfig.from_dict(d["model"])
        if "training" in d:
            cfg.training = TrainingConfig(**_filtered(TrainingConfig, d["training"]))
        if "paths" in d:
            cfg.paths = PathsConfig(**_filtered(PathsConfig, d["paths"]))
        if "logging" in d:
            cfg.logging = LoggingConfig(**_filtered(LoggingConfig, d["logging"]))
        if "mesh" in d:
            cfg.mesh = MeshConfig(**_filtered(MeshConfig, d["mesh"]))
        return cfg

    @classmethod
    def from_yaml(cls, path: Union[str, Path]) -> "Config":
        with open(path, "r") as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_yaml(self, path: Union[str, Path]) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def load_config(config_path: Union[str, Path]) -> Config:
    """Load a YAML config -- accepts both this framework's configs and the
    reference's ``config.yaml`` / ``cnn_blstm.yaml`` key layout."""
    return Config.from_yaml(config_path)


def gan_profile_config(config_path: Optional[Union[str, Path]] = None) -> Config:
    """``load_config(config_path)``, or -- when no YAML is given -- a default
    :class:`Config` with the GAN STFT profile (n_fft 512 / hop 128 / win 512,
    the reference's ``config.yaml:12-15``).

    The GAN checkpoints are profile-bound: scoring them through the default
    (CNN-profile) spectrogram silently mis-scores them.  Every CLI path that
    builds a GAN (inpaint/evaluate runners, the refiner's frozen GAN channel,
    ``train_refiner``) routes through this one helper so the defaulting rule
    cannot drift between call sites."""
    if config_path is not None:
        return load_config(config_path)
    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=128, win_length=512)
    return cfg
