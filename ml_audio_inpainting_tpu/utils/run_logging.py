"""Run management: directories, python logging, TensorBoard writer.

Mirrors the reference's observability backbone (SURVEY.md §5.5): per-run
log files + config dump (``models/GAN/train.py:141-176``), TensorBoard
scalars/figures/audio via ``tensorboardX`` (drop-in for
``torch.utils.tensorboard``), run naming ``<run_name>_<YYYYmmdd_HHMMSS>``.
"""

from __future__ import annotations

import dataclasses
import logging
import sys
from datetime import datetime
from pathlib import Path
from typing import Optional

import numpy as np
import yaml

__all__ = ["RunContext"]


class RunContext:
    """Creates run directories, a logfile, and a TensorBoard writer."""

    def __init__(self, cfg, run_name: Optional[str] = None, base_dir: str = "."):
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        name = run_name or cfg.logging.run_name
        self.run_name = f"{name}_{stamp}"
        base = Path(base_dir)
        self.checkpoint_dir = base / cfg.paths.checkpoint_dir / self.run_name
        self.log_dir = base / cfg.paths.log_dir
        self.sample_dir = base / cfg.paths.sample_dir / self.run_name
        self.tb_dir = base / cfg.paths.tensorboard_dir / self.run_name
        for d in (self.checkpoint_dir, self.log_dir, self.sample_dir, self.tb_dir):
            d.mkdir(parents=True, exist_ok=True)

        self.logger = logging.getLogger(self.run_name)
        self.logger.setLevel(logging.INFO)
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        fh = logging.FileHandler(self.log_dir / f"{self.run_name}.log")
        fh.setFormatter(fmt)
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        self.logger.addHandler(fh)
        self.logger.addHandler(sh)

        # Config dump at startup (train.py:164-173).
        self.logger.info(
            "config:\n%s", yaml.safe_dump(dataclasses.asdict(cfg), sort_keys=False)
        )

        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(str(self.tb_dir))
        except Exception:  # tensorboard optional
            self.writer = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def audio(self, tag: str, audio: np.ndarray, step: int, sample_rate: int = 16000) -> None:
        if self.writer is None:
            return
        try:
            self.writer.add_audio(
                tag, np.asarray(audio)[None, :], step, sample_rate=sample_rate
            )
        except Exception as e:  # tensorboardX needs soundfile for encoding
            self.logger.debug("TB audio logging unavailable: %s", e)

    def figure(self, tag: str, fig, step: int) -> None:
        if self.writer is None:
            return
        try:
            self.writer.add_figure(tag, fig, step)
        except Exception as e:
            self.logger.debug("TB figure logging unavailable: %s", e)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
