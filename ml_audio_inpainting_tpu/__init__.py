"""TPU-native audio-inpainting framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``savage-hacker14/ml-audio-inpainting`` (reference mounted read-only at
``/root/reference``): reconstructing zeroed-out gaps (80-500 ms) in 5 s,
16 kHz mono speech, working in the STFT magnitude domain, with three model
families:

* GAN            -- partial-convolution U-Net generator + spectral-norm
                    PatchGAN discriminator + VGG19 perceptual/style loss
                    (reference: ``models/GAN/``).
* CNN+BiLSTM     -- conv encoder -> BiLSTM bottleneck -> conv decoder
                    (reference: ``models/CNNBLSTM/``).
* Classical AR   -- Janssen iterative AR inpainting, forward/backward LPC
                    extrapolation, windowed overlap-add segmentation, and the
                    SPAIN sparsity family (reference: ``models/AudioReg/``,
                    originally MATLAB).

Unlike the reference (single-GPU PyTorch + MATLAB), everything here is built
TPU-first: DSP runs as batched on-device XLA/FFT ops, models are functional
flax modules jitted over a ``jax.sharding.Mesh``, the classical solvers are
batched linear algebra (``vmap`` over gaps/segments instead of MATLAB
``parfor``), and host-side audio I/O is a native C++ codec library.
"""

from ml_audio_inpainting_tpu.version import __version__

__all__ = ["__version__"]
