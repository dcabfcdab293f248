"""Real-clip probe sets for checkpoint selection.

``--probe-dir`` (cli/train.py, cli/train_refiner.py) selects checkpoints on
REAL held-out clips -- e.g. the reference's shipped validation-split outputs
under ``models/CNNBLSTM/output/`` -- instead of the in-domain synthetic
probe, which can prefer checkpoints that do not transfer (measured on the
round-3 refiner: synthetic-probe best +2.22 scored +1.04 on the real eval
clips).  Each clip is replicated once per requested gap position so F clips
give F x P probe measurements.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple, Union

import numpy as np

__all__ = ["load_real_probe_set"]


def load_real_probe_set(
    probe_dir: Union[str, Path],
    positions: Sequence[float],
    sample_rate: int,
    max_len_s: float,
    gap_len_s: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Load every audio file under ``probe_dir`` and replicate it once per
    gap position.

    Returns ``(clips (F*P, S) float32, gap_starts (F*P,) int32, n_files)``.
    ``gap_starts`` are clamped so a ``gap_len_s`` gap always fits inside the
    clip (a position past a short clip's end would silently probe nothing).
    """
    from ml_audio_inpainting_tpu.cli.inpaint import _collect
    from ml_audio_inpainting_tpu.data.audio_io import load_audio

    probe_dir = Path(probe_dir)
    if not probe_dir.exists():
        raise FileNotFoundError(f"probe dir {probe_dir} does not exist")
    files = _collect(probe_dir)
    if not files:
        raise FileNotFoundError(f"no audio files under {probe_dir}")
    base = np.stack([
        load_audio(f, sample_rate=sample_rate, max_len=max_len_s)[0]
        for f in files
    ])
    reps = len(positions)
    clips = np.repeat(base, reps, axis=0)
    starts = np.tile(
        np.asarray([int(t * sample_rate) for t in positions]), len(files)
    )
    gl = int(gap_len_s * sample_rate)
    starts = np.clip(starts, 0, clips.shape[-1] - gl - 1).astype(np.int32)
    return clips, starts, len(files)
