"""Video-frame UNet VAE and the energy-map UNet.

- ``UNetVideo``: 224x298x3 frame -> 3-ch sigmoid reconstruction with a
  1024-d VAE bottleneck and no skip concats
  (``/root/reference/models/unet_architecture_noconc.py:45-92``; the
  two-stage split of ``unet_architecture_noconc2.py`` is ``encode`` /
  ``decode``). Weight decay 7e-5.
- ``UNetEnergy``: 36x48x1 log-energy map autoencoder whose "latent" is the
  raw flattened 4x4x8 bottleneck used as both mean and variance
  (``/root/reference/models/unet_architecture_energy.py:48-95``); final
  activation is ReLU, not sigmoid. Weight decay 1e-6.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.models import layers
from acoustic_image_generation_tpu.models.blocks import ConvConvPool, VaeHead
from acoustic_image_generation_tpu.models.unet_ac import VaeOutput


class UNetVideo(nn.Module):
    """Scope ``UNet`` — video VAE, latent 1024. ``features`` /
    ``from_features`` expose the two-stage split of
    ``unet_architecture_noconc2.py`` for the joint-MVAE recipe."""

    latent_dim: int = 1024
    dtype: jnp.dtype | None = None

    def setup(self):
        dt = self.dtype

        def ccp(filters, name, pool=False, **kw):
            return ConvConvPool(filters, pool=pool, batch_norm=True, name=name, dtype=dt, **kw)

        self.layer1 = ccp((32, 32), "layer1", pool=True, pool_strides=(3, 3), pool_padding="VALID")
        self.layer2 = ccp((128, 128), "layer2", pool=True, pool_padding="VALID")
        self.layer3 = ccp(
            (256, 256), "layer3", pool=True, pool_strides=(3, 3),
            pool_padding="VALID", pool_kernel=(2, 3),
        )
        self.layer5 = ccp((512, 512), "layer5")
        self.vae = VaeHead(self.latent_dim, spatial=(12, 16), dtype=dt)
        self.dense_dec = layers.dense(12 * 16 * 50, name="dense", dtype=dt)
        self.conv_dec = layers.conv2d(512, (3, 3), name="conv_dec", dtype=dt)
        self.upsample_6 = layers.ConvTransposeTF(256, (3, 4), (3, 3), name="upsample_6", dtype=dt)
        self.layer6 = ccp((256, 256), "layer6")
        self.layer7 = ccp((256, 256), "layer7")
        self.upsample_8 = layers.ConvTransposeTF(128, (4, 3), (2, 2), name="upsample_8", dtype=dt)
        self.layer8 = ccp((128, 128), "layer8")
        self.layer9 = ccp((128, 128), "layer9")
        self.upsample_10 = layers.ConvTransposeTF(32, (5, 4), (3, 3), name="upsample_10", dtype=dt)
        self.layer10 = ccp((32, 32), "layer10")
        self.layer11 = ccp((32, 32), "layer11")
        self.final = layers.conv2d(3, (1, 1), name="final", dtype=dt)

    def features(self, x, *, train: bool = True) -> jnp.ndarray:
        """Stage-1 (12,16,512) feature map. 224x298 -> 74x99 -> 36x49 -> 12x16."""
        _, pool1 = self.layer1(x, train=train)
        _, pool2 = self.layer2(pool1, train=train)
        _, pool3 = self.layer3(pool2, train=train)
        return self.layer5(pool3, train=train)

    def decode(self, z, *, train: bool = True) -> jnp.ndarray:
        return nn.sigmoid(self._decode_logits(z, train=train))

    def _decode_logits(self, z, *, train: bool = True) -> jnp.ndarray:
        net = nn.relu(self.dense_dec(z))
        net = net.reshape(-1, 12, 16, 50)
        net = nn.relu(self.conv_dec(net))
        # 12x16 -> 36x49 -> 74x99 -> 224x298 via TF-rule deconvs
        up = self.upsample_6(net)
        up = self.layer6(up, train=train)
        up = self.layer7(up, train=train)
        up = self.upsample_8(up)
        up = self.layer8(up, train=train)
        up = self.layer9(up, train=train)
        up = self.upsample_10(up)
        up = self.layer10(up, train=train)
        up = self.layer11(up, train=train)
        return self.final(up)

    def from_features(self, conv5, *, sample: bool = True, train: bool = True) -> VaeOutput:
        z, mean, std = self.vae(conv5, sample=sample)
        logits = self._decode_logits(z, train=train)
        return VaeOutput(nn.sigmoid(logits), z, mean, std, conv5,
                         logits=logits)

    def __call__(self, x, *, sample: bool = True, train: bool = True) -> VaeOutput:
        conv5 = self.features(x, train=train)
        return self.from_features(conv5, sample=sample, train=train)


class UNetEnergy(nn.Module):
    """Scope ``UNetEnergy`` — 36x48x1 energy-map UNet with skip concats.

    No batch norm anywhere: the reference's BN lines are commented out in
    this file (``unet_architecture_energy.py:157-158,171-172``), unlike the
    video/sound UNets."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, sample: bool = True, train: bool = True) -> VaeOutput:
        dt = self.dtype

        def ccp(filters, name, pool=False, **kw):
            return ConvConvPool(filters, pool=pool, name=name, dtype=dt, **kw)

        conv1, pool1 = ccp((16, 16), "layer1", pool=True)(x, train=train)  # 18x24
        conv2, pool2 = ccp((16, 16), "layer2", pool=True)(pool1, train=train)  # 9x12
        conv3, pool3 = ccp(
            (8, 8), "layer3", pool=True, pool_padding="VALID", pool_kernel=(3, 5)
        )(pool2, train=train)  # 4x4
        conv4 = ccp((8, 8), "layer4")(pool3, train=train)

        # mean == variance == flattened bottleneck (unet_architecture_energy.py:66-70)
        flat = conv4.reshape(-1, 128)
        mean = flat
        variance = flat
        if sample and self.has_rng("latent"):
            eps = jax.random.normal(self.make_rng("latent"), variance.shape, variance.dtype)
            z = mean + variance * eps
        else:
            z = mean
        net = z.reshape(-1, 4, 4, 8)

        up = layers.ConvTransposeTF(8, (3, 6), (2, 2), name="upsample_6", dtype=dt)(net)  # 9x12
        up = ccp((8, 8), "layer6")(jnp.concatenate([up, conv3], -1), train=train)
        up = ccp((8, 8), "layer6_2")(up, train=train)
        up = layers.ConvTransposeTF(16, (2, 2), (2, 2), name="upsample_7", dtype=dt)(up)  # 18x24
        up = ccp((16, 16), "layer7")(jnp.concatenate([up, conv2], -1), train=train)
        up = ccp((16, 16), "layer7_2")(up, train=train)
        up = layers.ConvTransposeTF(16, (2, 2), (2, 2), name="upsample_8", dtype=dt)(up)  # 36x48
        up = ccp((16, 16), "layer8")(jnp.concatenate([up, conv1], -1), train=train)
        up = ccp((8, 8), "layer8_2")(up, train=train)
        out = nn.relu(layers.conv2d(1, (3, 3), name="final", dtype=dt)(up))
        return VaeOutput(out, z, mean, variance, conv4)


class UNetVideoSkip(nn.Module):
    """Legacy skip-connected video VAE (scope ``UNet``), the last 2.3
    inventory item: ``/root/reference/models/unet_architecture.py:46-95``.
    Only ``decodeimages.py:7`` consumes it upstream — kept for capability
    parity with the channel-plot tooling.

    224x298x3 -> 3-ch sigmoid; encoder 8/32/32/64 with strided-conv pools
    (rect VALID (2,3) pools at stages 2/4), 128-d latent with a RAW
    variance head (z = mean + variance*eps, no softplus — ``:63-68``),
    decoder upconv+skip concat at all four levels (``:74-84``). Weight
    decay 7e-5 (accounted by the caller like the other video VAEs)."""

    latent_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, sample: bool = True, train: bool = True) -> VaeOutput:
        dt = self.dtype

        def ccp(filters, name, pool=False, **kw):
            return ConvConvPool(filters, pool=pool, batch_norm=True, name=name, dtype=dt, **kw)

        conv1, pool1 = ccp((8, 8), "layer1", pool=True, pool_strides=(2, 2))(x, train=train)
        conv2, pool2 = ccp(
            (32, 32), "layer2", pool=True, pool_kernel=(2, 3),
            pool_strides=(2, 2), pool_padding="VALID",
        )(pool1, train=train)
        conv3, pool3 = ccp((32, 32), "layer3", pool=True, pool_strides=(2, 2))(pool2, train=train)
        conv4, pool4 = ccp(
            (64, 64), "layer4", pool=True, pool_kernel=(2, 3),
            pool_strides=(2, 2), pool_padding="VALID",
        )(pool3, train=train)
        conv5 = ccp((128, 128), "layer5")(pool4, train=train)

        mean = layers.conv2d(self.latent_dim, (14, 18), padding="VALID", name="mean", dtype=dt)(conv5)
        mean = mean.reshape(-1, self.latent_dim)
        variance = layers.conv2d(
            self.latent_dim, (14, 18), padding="VALID", name="variance", dtype=dt
        )(conv5)
        variance = variance.reshape(-1, self.latent_dim)
        if sample and self.has_rng("latent"):
            eps = jax.random.normal(self.make_rng("latent"), variance.shape, variance.dtype)
            z = mean + variance * eps
        else:
            z = mean

        net = nn.relu(layers.dense(14 * 18, name="dense", dtype=dt)(z))
        net = net.reshape(-1, 14, 18, 1)
        net = nn.relu(layers.conv2d(128, (3, 3), name="conv_dec", dtype=dt)(net))

        up6 = layers.ConvTransposeTF(64, (2, 3), (2, 2), name="upsample_6", dtype=dt)(net)
        conv6 = ccp((64, 64), "layer6")(jnp.concatenate([up6, conv4], -1), train=train)
        up7 = layers.ConvTransposeTF(32, (2, 2), (2, 2), name="upsample_7", dtype=dt)(conv6)
        conv7 = ccp((32, 32), "layer7")(jnp.concatenate([up7, conv3], -1), train=train)
        up8 = layers.ConvTransposeTF(32, (2, 3), (2, 2), name="upsample_8", dtype=dt)(conv7)
        conv8 = ccp((32, 32), "layer8")(jnp.concatenate([up8, conv2], -1), train=train)
        up9 = layers.ConvTransposeTF(8, (2, 2), (2, 2), name="upsample_9", dtype=dt)(conv8)
        conv9 = ccp((8, 8), "layer9")(jnp.concatenate([up9, conv1], -1), train=train)
        logits = layers.conv2d(3, (1, 1), name="final", dtype=dt)(conv9)
        return VaeOutput(nn.sigmoid(logits), z, mean, variance, conv5,
                         logits=logits)
