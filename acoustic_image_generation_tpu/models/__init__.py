"""Flax model zoo.

One parametrized implementation per architecture family replaces the
reference's 20 near-duplicate model files (SURVEY.md §2.3). All modules are
functional (param pytrees), take explicit ``train``/rng arguments instead of
``is_training``/``keep_prob`` placeholders, and compute in a configurable
dtype (bf16 on TPU) with float32 params.
"""

from acoustic_image_generation_tpu.models.decoders import (
    DecoderAudio,
    DecoderEnergy,
    DecoderVideo,
    MeanStd,
)
from acoustic_image_generation_tpu.models.dualcamnet import DualCamNet
from acoustic_image_generation_tpu.models.resnet import ResNet50
from acoustic_image_generation_tpu.models.unet_ac import UNetAcoustic, UNetAcResNet
from acoustic_image_generation_tpu.models.unet_sound import UNetSound
from acoustic_image_generation_tpu.models.unet_video import UNetEnergy, UNetVideo, UNetVideoSkip

__all__ = [
    "DecoderAudio",
    "DecoderEnergy",
    "DecoderVideo",
    "MeanStd",
    "DualCamNet",
    "ResNet50",
    "UNetAcoustic",
    "UNetAcResNet",
    "UNetSound",
    "UNetVideo",
    "UNetVideoSkip",
    "UNetEnergy",
]
