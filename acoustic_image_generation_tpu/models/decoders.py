"""Legacy latent -> modality decoders + ``mean_std`` normalization.

Ports the capability of ``/root/reference/models/decoders.py`` (217 LoC)
and ``/root/reference/models/meanvariance.py``: standalone decoders that
render a latent vector straight into a video frame / spatial energy map /
waveform, and the slim batch_norm fork that tracks moving mean/variance
with ``scale=False``. Both files are dead code upstream — nothing in
``main.py`` or any trainer imports them (verified by grep; PARITY.md) —
but they complete the model-zoo inventory and remain useful probes for
"what does this latent alone encode".

Architecture map (all stride-1 SAME convs, xavier init, relu unless
noted — slim defaults at ``decoders.py:34-37``):

- ``DecoderVideo`` (``decoders.py:8-80``): FC 36*48 -> FC 224*298 ->
  reshape (224, 298, 1) -> convs 8, 64, 512, 128, 64, 32, 16 (relu) ->
  conv 8 (linear, ``:48``) -> conv 3 (sigmoid, ``:49``).
- ``DecoderEnergy`` (``DualCamHybridModelDecoderEnergy``,
  ``decoders.py:82-149``): FC 12*16 -> FC 36*48 -> reshape (36, 48, 1)
  -> convs 64/5x5, 32/5x5, 16/5x5, 8/3x3, 4/3x3, 2/3x3, 1/3x3 (relu).
- ``DecoderAudio`` (``decoders.py:151-217``): FC 1024 -> FC 12288 ->
  reshape (12288, 1, 1) -> tall 1-D convs 128/1024, 64/512, 32/128,
  16/32, 8/16, 4/3, 1/1 (relu) — a 12288-sample (1 s) waveform head.
- ``MeanStd`` (``meanvariance.py:31-130``): slim batch_norm fork with
  ``center=True, scale=False`` (beta only), decay 0.999, eps 0.001.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from acoustic_image_generation_tpu.models import layers


class _FCConvDecoder(nn.Module):
    """Shared skeleton: two relu FCs -> reshape -> SAME conv stack.

    ``convs`` entries are (features, kernel, activation) with activation
    one of "relu" | "linear" | "sigmoid".
    """

    fc_sizes: tuple[int, int]
    grid: tuple[int, int]  # reshape target (H, W), channels=1
    convs: tuple[tuple[int, tuple[int, int], str], ...]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z):
        dt = self.dtype
        net = z.reshape(z.shape[0], -1)
        for i, width in enumerate(self.fc_sizes):
            net = nn.relu(layers.dense(width, name=f"fc_{i}", dtype=dt)(net))
        net = net.reshape(-1, *self.grid, 1)
        for i, (feat, kern, act) in enumerate(self.convs):
            net = layers.conv2d(feat, kern, name=f"conv_{i}", dtype=dt)(net)
            if act == "relu":
                net = nn.relu(net)
            elif act == "sigmoid":
                net = nn.sigmoid(net)
        return net


def DecoderVideo(dtype=None) -> _FCConvDecoder:
    """Latent -> 224x298x3 sigmoid frame (``decoders.py:38-49``)."""
    return _FCConvDecoder(
        fc_sizes=(36 * 48, 224 * 298),
        grid=(224, 298),
        convs=(
            (8, (3, 3), "relu"),
            (64, (3, 3), "relu"),
            (512, (3, 3), "relu"),
            (128, (3, 3), "relu"),
            (64, (3, 3), "relu"),
            (32, (3, 3), "relu"),
            (16, (3, 3), "relu"),
            (8, (3, 3), "linear"),
            (3, (3, 3), "sigmoid"),
        ),
        dtype=dtype,
    )


def DecoderEnergy(dtype=None) -> _FCConvDecoder:
    """Latent -> 36x48x1 energy map (``decoders.py:104-119``)."""
    return _FCConvDecoder(
        fc_sizes=(12 * 16, 36 * 48),
        grid=(36, 48),
        convs=(
            (64, (5, 5), "relu"),
            (32, (5, 5), "relu"),
            (16, (5, 5), "relu"),
            (8, (3, 3), "relu"),
            (4, (3, 3), "relu"),
            (2, (3, 3), "relu"),
            (1, (3, 3), "relu"),
        ),
        dtype=dtype,
    )


def DecoderAudio(dtype=None) -> _FCConvDecoder:
    """Latent -> 12288x1x1 waveform (``decoders.py:183-193``)."""
    return _FCConvDecoder(
        fc_sizes=(1024, 12288),
        grid=(12288, 1),
        convs=(
            (128, (1024, 1), "relu"),
            (64, (512, 1), "relu"),
            (32, (128, 1), "relu"),
            (16, (32, 1), "relu"),
            (8, (16, 1), "relu"),
            (4, (3, 1), "relu"),
            (1, (1, 1), "relu"),
        ),
        dtype=dtype,
    )


class MeanStd(nn.Module):
    """``meanvariance.mean_std``: batch norm tracking moving mean/variance
    with a learned offset but NO scale (``center=True, scale=False``,
    ``meanvariance.py:32-35``); decay 0.999, epsilon 0.001."""

    use_running_average: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.999,
            epsilon=0.001,
            use_bias=True,
            use_scale=False,
            dtype=self.dtype,
        )(x)
