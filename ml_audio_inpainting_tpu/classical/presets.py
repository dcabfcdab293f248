"""Measured per-condition solver presets for the classical (deployable) path.

The reference ships one fixed configuration per solver
(``/root/reference/models/AudioReg/utils/arinpaint.m:1-20`` — order 512,
maxlen 4096, cos^2 crossfade; ``janssen_inp.m:1-30`` — maxit 10).  This repo
measured, per gap-length condition, whether that choice is optimal, using a
probe protocol that never touches the eval clips (3 reference
validation-split clips x 10 gap positions; ``cli/ar_tune.py``,
``results/ar_tuned_per_length.json``).  The findings:

* **40 ms**: the config grid spans 2.7 dB and the probe ranks it almost
  perfectly (spearman 0.926).  Winner: context 4096, order 256,
  ``linear`` blend with floor 0.2 — **+3.42 dB** eval vs the defaults'
  +3.13, within 0.01 dB of the grid's eval-oracle.
* **80 ms**: context 8192, order 512, ``sigmoid`` blend k=2 — **+2.84 dB**
  vs +2.55 defaults (``results/ar_blend_sweep.json``,
  ``results/ar_context_sweep.json``).  Janssen's champion at 80–160 ms is
  context 8192, maxit 5 (+2.46/+2.54; ``results/ar_tuned_per_length.json``
  janssen rows).
* **>= 160 ms** (arinpaint): every grid config lands within ~0.15 dB of the
  defaults (eval-oracle gains 0.08/0.0/0.01 dB) and the probe ranking is
  noise (spearman -0.4..0) — keep the reference defaults.

These tables hard-code exactly those measured winners so
``--ar-preset tuned`` deploys them without re-running the probe.  The
arinpaint boundaries are midpoints between measured conditions
(40/80/160/320/500 ms); the janssen cutoff is intentionally conservative at
0.2 s (below the 160/320 midpoint) because no Janssen grid was run past
160 ms.  All presets are calibrated on the SINGLE-gap eval condition.
"""

from __future__ import annotations

__all__ = ["tuned_arinpaint_preset", "tuned_janssen_preset"]


def tuned_arinpaint_preset(gap_len_s: float) -> dict:
    """Measured-best ``arinpaint`` overrides for a gap length (seconds).

    Returns a dict of CLI-arg overrides (``ar_order``, ``ar_context``,
    ``ar_blend``, ``ar_blend_param``); empty where the measured winner is
    the default configuration (>= 160 ms).
    """
    if gap_len_s <= 0.06:  # the measured 40 ms condition
        return {
            "ar_order": 256,
            "ar_context": 4096,
            "ar_blend": "linear",
            "ar_blend_param": 0.2,
        }
    if gap_len_s <= 0.12:  # the measured 80 ms condition
        return {
            "ar_order": 512,
            "ar_context": 8192,
            "ar_blend": "sigmoid",
            "ar_blend_param": 2.0,
        }
    return {}  # >= 160 ms: defaults measured within ~0.15 dB of oracle


def tuned_janssen_preset(gap_len_s: float) -> dict:
    """Measured-best gap-wise Janssen overrides for a gap length (seconds).

    The 10-position probe selects context 8192 / maxit 5 at both measured
    short conditions (80 ms: +2.46 eval — the grid's oracle; 160 ms: +2.54,
    within 0.04 dB of oracle).  Past 160 ms no per-condition Janssen grid
    was run; the preset conservatively keeps the defaults there.
    """
    if gap_len_s <= 0.2:
        return {"ar_context": 8192, "maxit": 5}
    return {}
