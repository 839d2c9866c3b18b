"""Audio-spectrogram UNet VAEs.

Two wirings behind one module:
- ``variant='large'``: 193x257x1 spectrogram, 256-d latent, 4 down / 4 up
  stages without skip concats, BN everywhere, weight decay 8e-5
  (``/root/reference/models/unet_sound2.py:49-101``; the two-stage split of
  ``unet_sound22.py`` is the ``encode``/``decode`` methods).
- ``variant='small'``: 99x257x1 spectrogram, 128-d latent with a *raw*
  (no softplus) ``variance`` head, skip concats on every up stage, weight
  decay 6e-5 (``/root/reference/models/unet_sound.py:48-97``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.models import layers
from acoustic_image_generation_tpu.models.blocks import ConvConvPool, VaeHead
from acoustic_image_generation_tpu.models.unet_ac import VaeOutput


class UNetSound(nn.Module):
    """Scope ``UNetAudio``."""

    variant: str = "large"  # 'large' (unet_sound2) | 'small' (unet_sound)
    # 256 is the reference's large-variant latent (unet_sound2.py:66);
    # overridable so the embed recipes can share one latent dim across
    # modalities (see train/embed.py).
    latent_dim: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, sample: bool = True, train: bool = True) -> VaeOutput:
        if self.variant == "large":
            return self._large(x, sample=sample, train=train)
        return self._small(x, sample=sample, train=train)

    def _large(self, x, *, sample, train) -> VaeOutput:
        dt = self.dtype

        def ccp(filters, name, pool=False, **kw):
            return ConvConvPool(filters, pool=pool, batch_norm=True, name=name, dtype=dt, **kw)

        _, pool1 = ccp((16, 16), "layer1", pool=True, pool_padding="VALID")(x, train=train)
        _, pool2 = ccp((16, 16), "layer2", pool=True)(pool1, train=train)
        _, pool3 = ccp((64, 64), "layer3", pool=True)(pool2, train=train)
        _, pool4 = ccp((128, 128), "layer4", pool=True)(pool3, train=train)
        conv5 = ccp((128, 128), "layer5")(pool4, train=train)

        z, mean, std = VaeHead(self.latent_dim, spatial=(12, 16), dtype=dt)(conv5, sample=sample)

        net = nn.relu(layers.dense(12 * 16 * 10, name="dense", dtype=dt)(z))
        net = net.reshape(-1, 12, 16, 10)
        net = nn.relu(layers.conv2d(128, (3, 3), name="conv_dec", dtype=dt)(net))
        up = layers.ConvTransposeTF(128, (2, 2), (2, 2), name="upsample_6", dtype=dt)(net)
        up = ccp((128, 128), "layer6")(up, train=train)
        up = ccp((128, 128), "layer7")(up, train=train)
        up = layers.ConvTransposeTF(64, (2, 2), (2, 2), name="upsample_8", dtype=dt)(up)
        up = ccp((64, 64), "layer8")(up, train=train)
        up = ccp((64, 64), "layer9")(up, train=train)
        up = layers.ConvTransposeTF(16, (2, 2), (2, 2), name="upsample_10", dtype=dt)(up)
        up = ccp((16, 16), "layer10")(up, train=train)
        up = ccp((16, 16), "layer11")(up, train=train)
        up = layers.ConvTransposeTF(16, (3, 3), (2, 2), name="upsample_12", dtype=dt)(up)
        up = ccp((16, 16), "layer12")(up, train=train)
        up = ccp((16, 16), "layer13")(up, train=train)
        out = nn.sigmoid(layers.conv2d(1, (1, 1), name="final", dtype=dt)(up))
        return VaeOutput(out, z, mean, std, conv5)

    def _small(self, x, *, sample, train) -> VaeOutput:
        dt = self.dtype

        def ccp(filters, name, pool=False, **kw):
            return ConvConvPool(filters, pool=pool, batch_norm=True, name=name, dtype=dt, **kw)

        conv1, pool1 = ccp((8, 8), "layer1", pool=True, pool_padding="VALID")(x, train=train)
        conv2, pool2 = ccp((8, 8), "layer2", pool=True, pool_padding="VALID", pool_kernel=(3, 2))(
            pool1, train=train
        )
        conv3, pool3 = ccp((32, 32), "layer3", pool=True)(pool2, train=train)
        conv4, pool4 = ccp((64, 64), "layer4", pool=True)(pool3, train=train)
        conv5 = ccp((128, 128), "layer5")(pool4, train=train)

        # mean / raw-variance heads (unet_sound.py:65-70 — no softplus).
        mean = layers.conv2d(128, (6, 16), padding="VALID", name="mean", dtype=dt)(conv5)
        mean = mean.reshape(-1, 128)
        variance = layers.conv2d(128, (6, 16), padding="VALID", name="variance", dtype=dt)(conv5)
        variance = variance.reshape(-1, 128)
        if sample and self.has_rng("latent"):
            eps = jax.random.normal(self.make_rng("latent"), variance.shape, variance.dtype)
            z = mean + variance * eps
        else:
            z = mean

        net = nn.relu(layers.dense(6 * 16, name="dense", dtype=dt)(z))
        net = net.reshape(-1, 6, 16, 1)
        net = nn.relu(layers.conv2d(128, (3, 3), name="conv_dec", dtype=dt)(net))
        up = layers.ConvTransposeTF(64, (2, 2), (2, 2), name="upsample_6", dtype=dt)(net)
        up = ccp((64, 64), "layer6")(jnp.concatenate([up, conv4], -1), train=train)
        up = layers.ConvTransposeTF(32, (2, 2), (2, 2), name="upsample_7", dtype=dt)(up)
        up = ccp((32, 32), "layer7")(jnp.concatenate([up, conv3], -1), train=train)
        up = layers.ConvTransposeTF(8, (3, 2), (2, 2), name="upsample_8", dtype=dt)(up)
        up = ccp((8, 8), "layer8")(jnp.concatenate([up, conv2], -1), train=train)
        up = layers.ConvTransposeTF(8, (3, 3), (2, 2), name="upsample_9", dtype=dt)(up)
        up = ccp((8, 8), "layer9")(jnp.concatenate([up, conv1], -1), train=train)
        out = nn.sigmoid(layers.conv2d(1, (1, 1), name="final", dtype=dt)(up))
        return VaeOutput(out, z, mean, variance, conv5)
