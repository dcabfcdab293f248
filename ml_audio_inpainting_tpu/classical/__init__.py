"""Classical autoregressive + sparsity inpainting (the AudioReg tier).

TPU-native replacements for the reference's MATLAB stack
(``models/AudioReg/``): Janssen iterative AR inpainting, forward/backward
LPC extrapolation, windowed overlap-add segmentation, the SPAIN family, and
learned-basis SPAIN -- all batched, jittable linear algebra.
"""

from ml_audio_inpainting_tpu.classical.arinpaint import ar_extrapolate, arinpaint
from ml_audio_inpainting_tpu.classical.basisopt import (
    aspain_learned,
    hard_threshold_columns,
    optimize_basis,
    sspain_learned,
)
from ml_audio_inpainting_tpu.classical.janssen import janssen, janssen_gapwise
from ml_audio_inpainting_tpu.classical.ola import ola_windows, segmentation_inpaint
from ml_audio_inpainting_tpu.classical.spain import (
    aspain_core,
    hard_threshold_dft,
    spain_inpaint,
    sspain_core,
)

__all__ = [
    "ar_extrapolate",
    "arinpaint",
    "aspain_learned",
    "hard_threshold_columns",
    "optimize_basis",
    "sspain_learned",
    "janssen",
    "janssen_gapwise",
    "ola_windows",
    "segmentation_inpaint",
    "aspain_core",
    "hard_threshold_dft",
    "spain_inpaint",
    "sspain_core",
]
