"""Acoustic-image UNet family (36x48x12 in / out).

Covers four reference files with two parametrized modules:
- ``UNetAcoustic``: the skip-less acoustic VAE
  (``/root/reference/models/unet_noconc.py:46-83``), including the
  external-latent "UNetzvariable" variant (``unet_z.py:46-63``) used by the
  projection recipe, and the two-stage encode/decode split of
  ``unet_noconc2.py`` (exposed as ``encode`` / ``decode`` methods).
- ``UNetAcResNet``: the AAAI'21 generator conditioning a tiled-MFCC map on
  ResNet50 features (``unet_acresnet.py:43-101``), with ``skips`` in
  {0, 1, 2} selecting the ablation wiring (``unet_acresnet0skip.py`` /
  ``unet_acresnet2skip.py``) and ``embedding=True`` the deterministic-AE
  mode.

Encoder downsampling is a stride-3 "pool" conv (36x48 -> 12x16); the decoder
upsamples with the TF-semantics kernel-2/stride-3 transposed conv
(12x16 -> 36x48, see ``ops.tf_compat``). Final activation is sigmoid.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from acoustic_image_generation_tpu.models import layers
from acoustic_image_generation_tpu.models.blocks import ConvConvPool, VaeHead, reparameterize


class VaeOutput(NamedTuple):
    output: jnp.ndarray  # reconstruction, same shape as input
    z: jnp.ndarray  # sampled (or deterministic) latent
    mean: jnp.ndarray
    std: jnp.ndarray | None  # None in embedding/AE mode
    features: jnp.ndarray  # bottleneck feature map ("features" end point)
    # pre-sigmoid logits of ``output`` where the family exposes them
    # (None elsewhere). Consumed by logit-space losses: the reference's
    # MSE gradient carries sigmoid'(logit), which underflows to exactly
    # zero once Adam drives the background logits past ~-88
    # (scripts/diag_collapse.py traces the resulting dead-sigmoid
    # collapse on sparse targets), while BCE's (y - t) logit gradient
    # self-corrects at any saturation depth.
    logits: jnp.ndarray | None = None


class UNetAcoustic(nn.Module):
    """Skip-less acoustic-image VAE (scope ``UNetAcoustic``)."""

    channels: int = 12
    latent_dim: int = 150
    dtype: jnp.dtype | None = None

    def setup(self):
        dt = self.dtype
        self.layer1 = ConvConvPool(
            (128, 128), pool=True, pool_strides=(3, 3), name="layer1", dtype=dt
        )
        self.layer3 = ConvConvPool((133, 133), name="layer3", dtype=dt)
        self.vae = VaeHead(self.latent_dim, dtype=dt)
        self.dense_dec = layers.dense(12 * 16 * 12, name="dense", dtype=dt)
        self.conv_dec = layers.conv2d(133, (3, 3), name="conv_dec", dtype=dt)
        self.upsample_1 = layers.ConvTransposeTF(128, (2, 2), (3, 3), name="upsample_1", dtype=dt)
        self.layer4 = ConvConvPool((128, 128), name="layer4", dtype=dt)
        self.layer5 = ConvConvPool((128, 128), name="layer5", dtype=dt)
        self.final = layers.conv2d(self.channels, (3, 3), name="final", dtype=dt)

    def features(self, x) -> jnp.ndarray:
        """Stage-1 feature map (12,16,133) — the two-stage split of
        ``unet_noconc2.py`` used by the joint-MVAE recipe, which swaps
        bottleneck feature maps through an associator
        (``/root/reference/trainer/trainermulti.py:45-59``)."""
        _, pool1 = self.layer1(x)
        return self.layer3(pool1)

    def from_features(self, conv2, *, sample: bool = True) -> VaeOutput:
        """Stage-2: VAE head + decoder over a (possibly associator-swapped)
        feature map."""
        z, mean, std = self.vae(conv2, sample=sample)
        logits = self._decode_logits(z)
        return VaeOutput(nn.sigmoid(logits), z, mean, std, conv2,
                         logits=logits)

    def encode(self, x, *, sample: bool = True):
        """Encoder half, returning (z, mean, std, features)."""
        conv2 = self.features(x)
        z, mean, std = self.vae(conv2, sample=sample)
        return z, mean, std, conv2

    def decode(self, z) -> jnp.ndarray:
        """Decoder half (``unet_noconc.py:67-79``); separately callable for
        the two-stage / associator recipes (``unet_noconc2.py``)."""
        return nn.sigmoid(self._decode_logits(z))

    def _decode_logits(self, z) -> jnp.ndarray:
        net = nn.relu(self.dense_dec(z))
        net = net.reshape(-1, 12, 16, 12)
        net = nn.relu(self.conv_dec(net))
        up1 = self.upsample_1(net)
        conv4 = self.layer4(up1)
        conv5 = self.layer5(conv4)
        return self.final(conv5)

    def __call__(self, x, *, external_latent=None, sample: bool = True, train: bool = True) -> VaeOutput:
        del train  # no BN in this family
        z, mean, std, features = self.encode(x, sample=sample)
        if external_latent is not None:
            # unet_z.py:63 — decode from another modality's (mean, std).
            mean2, std2 = external_latent
            if sample and self.has_rng("latent"):
                z = reparameterize(self.make_rng("latent"), mean2, std2)
            else:
                z = mean2
        logits = self._decode_logits(z)
        return VaeOutput(nn.sigmoid(logits), z, mean, std, features,
                         logits=logits)


class UNetAcResNet(nn.Module):
    """AAAI'21 generator: tiled-MFCC map + ResNet50 conv_map -> acoustic image
    (scope ``UNetAcRes``)."""

    channels: int = 12
    latent_dim: int = 150
    skips: int = 1  # 0 | 1 | 2
    embedding: bool = False  # deterministic AE instead of VAE
    # Route the stride-1 conv+ReLU chains through the fused Pallas kernel
    # (ops/pallas_conv) on TPU; same parameter tree, same math up to MXU
    # summation order. The strided "pool" convs and the 133-channel
    # bottleneck (lane-unaligned) stay on XLA.
    fused: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, mfccmap, resnet_feature, *, sample: bool = True, train: bool = True) -> VaeOutput:
        del train
        dt = self.dtype
        fu = self.fused
        conv1, pool1 = ConvConvPool(
            (128, 128), pool=True, pool_strides=(3, 3), name="layer1", dtype=dt,
            fused=fu,
        )(mfccmap)
        conv2_0 = ConvConvPool((133, 133), name="layer2", dtype=dt)(pool1)
        # Min-max normalize both feature maps before concat
        # (unet_acresnet.py:55-60).
        conv2 = layers.minmax_norm(conv2_0, axes=(1, 2, 3))
        resnet_feature = layers.minmax_norm(resnet_feature, axes=(1, 2, 3))
        conv2 = jnp.concatenate([conv2, resnet_feature.astype(conv2.dtype)], axis=-1)

        z, mean, std = VaeHead(
            self.latent_dim, embedding=self.embedding, dtype=dt, name="vae"
        )(conv2, sample=sample)

        net = nn.relu(layers.dense(12 * 16 * 12, name="dense", dtype=dt)(z))
        net = net.reshape(-1, 12, 16, 12)
        net = nn.relu(layers.conv2d(133, (3, 3), name="conv_dec", dtype=dt)(net))
        if self.skips >= 2:  # unet_acresnet2skip.py: bottleneck concat
            net = jnp.concatenate([net, conv2_0], axis=-1)
        conv4 = ConvConvPool((128, 128), name="layer4", dtype=dt, fused=fu)(net)
        conv5 = ConvConvPool((128, 128), name="layer5", dtype=dt, fused=fu)(conv4)
        up1 = layers.ConvTransposeTF(128, (2, 2), (3, 3), name="upsample_1", dtype=dt)(conv5)
        if self.skips >= 1:  # skip from the pre-pool encoder features
            up1 = jnp.concatenate([up1, conv1], axis=-1)
        conv6 = ConvConvPool((128, 128), name="layer6", dtype=dt, fused=fu)(up1)
        conv7 = ConvConvPool((64, 64), name="layer7", dtype=dt, fused=fu)(conv6)
        logits = layers.conv2d(self.channels, (3, 3), name="final", dtype=dt)(conv7)
        out = nn.sigmoid(logits)
        return VaeOutput(out, z, mean, std, conv2, logits=logits)


def tile_mfccmap(mfcc: jnp.ndarray, height: int = 36, width: int = 48) -> jnp.ndarray:
    """(N, 12) MFCC vector -> (N, 36, 48, 12) tiled map
    (``/root/reference/trainer/mfcctrainer.py:38-40``). A broadcast, so XLA
    fuses it into the first conv with no HBM materialization."""
    return jnp.broadcast_to(mfcc[:, None, None, :], (mfcc.shape[0], height, width, mfcc.shape[1]))
