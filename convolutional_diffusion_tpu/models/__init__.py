"""Flax backbones for convolutional diffusion (NHWC, TPU-native)."""

from .ddim import DiffusionModel
from .embedding import TimeClassEmbedding
from .resnet import MinimalResNet
from .unet import MinimalUNet, UBlock

__all__ = [
    "DiffusionModel",
    "TimeClassEmbedding",
    "MinimalResNet",
    "MinimalUNet",
    "UBlock",
]
