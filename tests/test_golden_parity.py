"""Golden-metric regression against the reference's actual shipped outputs.

The reference records cross-model scores in ``model_comparison.mat``
(written by ``models/AudioReg/model_eval.m:60,84``) computed from the
reconstructions it ships in ``test_samples_reconstructed/``.  These tests
gate this framework's audio I/O + gap placement + metric stack on
reproducing those recorded scalars from the same artifacts, and exercise
the ``--golden`` evaluate-CLI mode end to end (VERDICT round-1 item #2).
"""

import json
from pathlib import Path

import numpy as np
import pytest

REF_CLEAN = Path("/root/reference/test_samples")
REF_RECON = Path("/root/reference/test_samples_reconstructed")

pytestmark = pytest.mark.skipif(
    not REF_RECON.exists(), reason="reference artifacts unavailable"
)


def _load(path):
    from ml_audio_inpainting_tpu.data.audio_io import load_audio

    return np.asarray(load_audio(path, sample_rate=16000, max_len=5.0)[0])


@pytest.mark.parametrize(
    "tag,recorded",
    [("cnnlstm", -2.12), ("gan", -1.39)],
)
def test_recorded_gap_sdr_reproduces(tag, recorded):
    """Recompute model_comparison.mat's SDR from the shipped FLACs.

    model_eval.m:33-36 builds the gap mask with MATLAB 1-based inclusive
    indexing; the recorded values must reproduce to ~0.01 dB through this
    framework's FLAC decoder and metric definitions.
    """
    from ml_audio_inpainting_tpu.cli.evaluate import (
        golden_gap_sdr,
        matlab_gap_slice,
    )

    clean = _load(REF_CLEAN / "81-121543-0008.flac")
    rec = _load(REF_RECON / f"81-121543-0008_{tag}_inpainted.flac")
    gap = matlab_gap_slice(16000, 2.0, 0.08)
    got = golden_gap_sdr(clean, rec, gap)
    assert got == pytest.approx(recorded, abs=0.02)


def test_golden_cli_end_to_end(tmp_path):
    """--golden runs a framework model over the 9 clips and scores it
    against the reference's reconstructions (gap-SDR deltas + spec L2)."""
    from ml_audio_inpainting_tpu.cli.evaluate import main

    out = tmp_path / "golden.json"
    main(
        [
            "--models",
            "arinpaint",
            "--ar-order",
            "128",
            "--golden",
            str(REF_RECON),
            "--output-json",
            str(out),
        ]
    )
    payload = json.loads(out.read_text())

    # Anchor scalars reproduced inside the CLI too.
    chk = payload["anchor_check"]
    assert chk["gan"]["recomputed_gap_sdr_db"] == pytest.approx(-1.39, abs=0.02)
    assert chk["cnnlstm"]["recomputed_gap_sdr_db"] == pytest.approx(-2.12, abs=0.02)

    # All 9 clips scored for both reference model families.
    for tag in ("gan", "cnnlstm"):
        assert len(payload["reference_outputs"][tag]["gap_sdr_db"]) == 9

    ours = payload["ours"]["arinpaint"]
    assert len(ours["gap_sdr_db"]) == 9
    for tag in ("gan", "cnnlstm"):
        assert len(ours[f"delta_gap_sdr_vs_{tag}_db"]) == 9
        l2 = ours[f"spec_l2_vs_{tag}"]
        assert len(l2) == 9
        assert all(v >= 0.0 for v in l2.values())
    # LPC extrapolation is known-good on this eval set; it must not be
    # catastrophically below the shipped neural reconstructions.
    assert ours["mean_delta_vs_gan_db"] > -3.0
