"""Model families: GAN (PConv U-Net + PatchGAN + VGG), CNN+BiLSTM, legacy
BLSTM variants."""

from ml_audio_inpainting_tpu.models.cnn_blstm import StackedBLSTMCNN
from ml_audio_inpainting_tpu.models.discriminator import Discriminator
from ml_audio_inpainting_tpu.models.legacy_blstm import (
    StackedBLSTM,
    StackedBLSTMGapOnly,
    StackedNormBLSTM,
)
from ml_audio_inpainting_tpu.models.pconv_unet import PartialConv, PConvUNet
from ml_audio_inpainting_tpu.models.vgg import (
    VGG19Features,
    vgg19_params,
    vgg_perceptual_style_losses,
)

__all__ = [
    "StackedBLSTMCNN",
    "Discriminator",
    "StackedBLSTM",
    "StackedBLSTMGapOnly",
    "StackedNormBLSTM",
    "PartialConv",
    "PConvUNet",
    "VGG19Features",
    "vgg19_params",
    "vgg_perceptual_style_losses",
]
