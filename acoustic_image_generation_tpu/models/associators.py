"""Latent-space translators and joint-MVAE fusers
(``/root/reference/models/multimodal.py``).

- ``LatentAssociator``: per-(mean, std) MLP stacks translating one
  modality's Gaussian latent into the acoustic latent space.
  ``AssociatorVideoAc`` = hidden (512,512,256,256,150)
  (``multimodal.py:21-48``); ``AssociatorAudioAc`` = hidden (256,256)
  (``:91-112``). The std branch ends in softplus.
- ``AssociatorAudioEncoder``: conv encoder from the 193x257 spectrogram
  directly to a (150,150) acoustic latent — a clone of UNetSound's front
  half with its own (12,16)-VALID mean/std convs (``:139-204``).
- ``JointMVAE``: feature-map fuser — concat inputs along channels, three
  relu dense(512) layers applied per spatial position, then per-modality
  relu heads (ac 133 / video 512 / audio 128). Covers all three reference
  classes: ``Jointmvae`` (3 in / 3 out, ``:287-320``), ``JointTwomvae``
  (2 in / ac out, ``:349-380``), ``JointTwomvae2`` (2 in / 3 out,
  ``:406-440``) via the ``heads`` field.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from acoustic_image_generation_tpu.models import layers
from acoustic_image_generation_tpu.models.blocks import ConvConvPool

VIDEO_AC_HIDDEN = (512, 512, 256, 256, 150)
AUDIO_AC_HIDDEN = (256, 256)


class LatentAssociator(nn.Module):
    """(mean_in, std_in) -> (mean_150, softplus std_150)."""

    hidden: tuple[int, ...] = VIDEO_AC_HIDDEN
    latent_dim: int = 150
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, mean, std):
        dt = self.dtype
        m = mean
        for i, h in enumerate(self.hidden):
            m = nn.relu(layers.dense(h, name=f"mean_{i}", dtype=dt)(m))
        m = layers.dense(self.latent_dim, name="mean_out", dtype=dt)(m)
        s = std
        for i, h in enumerate(self.hidden):
            s = nn.relu(layers.dense(h, name=f"std_{i}", dtype=dt)(s))
        s = nn.softplus(layers.dense(self.latent_dim, name="std_out", dtype=dt)(s))
        return m.reshape(-1, self.latent_dim), s.reshape(-1, self.latent_dim)


class AssociatorAudioEncoder(nn.Module):
    """193x257x1 spectrogram -> (mean_150, softplus std_150), BN encoder
    (``multimodal.py:156-181``; weight decay 8e-5)."""

    latent_dim: int = 150
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dt = self.dtype

        def ccp(filters, name, **kw):
            return ConvConvPool(filters, pool=True, batch_norm=True, name=name, dtype=dt, **kw)

        _, p1 = ccp((16, 16), "layer1", pool_padding="VALID")(x, train=train)
        _, p2 = ccp((16, 16), "layer2")(p1, train=train)
        _, p3 = ccp((64, 64), "layer3")(p2, train=train)
        _, p4 = ccp((128, 128), "layer4")(p3, train=train)
        conv5 = ConvConvPool((128, 128), batch_norm=True, name="layer5", dtype=dt)(
            p4, train=train
        )
        mean = layers.conv2d(self.latent_dim, (12, 16), padding="VALID", name="mean", dtype=dt)(conv5)
        std = layers.conv2d(self.latent_dim, (12, 16), padding="VALID", name="std", dtype=dt)(conv5)
        return (
            mean.reshape(-1, self.latent_dim),
            nn.softplus(std.reshape(-1, self.latent_dim)),
        )


class JointMVAE(nn.Module):
    """Concat (N,12,16,C_i) feature maps -> shared dense trunk -> per-
    modality feature heads. ``heads`` selects which outputs exist."""

    heads: tuple[str, ...] = ("ac", "video", "audio")
    head_dims: dict | None = None  # default {ac:133, video:512, audio:128}
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, *feature_maps):
        dims = self.head_dims or {"ac": 133, "video": 512, "audio": 128}
        dt = self.dtype
        net = jnp.concatenate(feature_maps, axis=-1)
        for i in range(3):
            net = nn.relu(layers.dense(512, name=f"dense_{i}", dtype=dt)(net))
        return {
            h: nn.relu(layers.dense(dims[h], name=f"out_{h}", dtype=dt)(net))
            for h in self.heads
        }
