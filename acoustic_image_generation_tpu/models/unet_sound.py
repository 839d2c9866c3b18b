"""Audio-spectrogram UNet VAEs.

Two wirings behind one module:
- ``variant='large'``: 193x257x1 spectrogram, 256-d latent, 4 down / 4 up
  stages without skip concats, BN everywhere, weight decay 8e-5
  (``/root/reference/models/unet_sound2.py:49-101``); the two-stage split
  of ``unet_sound22.py`` is the ``features`` / ``from_features`` methods
  used by the joint-MVAE recipe.
- ``variant='small'``: 99x257x1 spectrogram, 128-d latent with a *raw*
  (no softplus) ``variance`` head, skip concats on every up stage, weight
  decay 6e-5 (``/root/reference/models/unet_sound.py:48-97``). The small
  variant's latent is fixed at 128 regardless of ``latent_dim``.
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

    def setup(self):
        dt = self.dtype

        def ccp(filters, name, pool=False, **kw):
            return ConvConvPool(filters, pool=pool, batch_norm=True, name=name, dtype=dt, **kw)

        if self.variant == "large":
            self.layer1 = ccp((16, 16), "layer1", pool=True, pool_padding="VALID")
            self.layer2 = ccp((16, 16), "layer2", pool=True)
            self.layer3 = ccp((64, 64), "layer3", pool=True)
            self.layer4 = ccp((128, 128), "layer4", pool=True)
            self.layer5 = ccp((128, 128), "layer5")
            self.vae = VaeHead(self.latent_dim, spatial=(12, 16), dtype=dt)
            self.dense_dec = layers.dense(12 * 16 * 10, name="dense", dtype=dt)
            self.conv_dec = layers.conv2d(128, (3, 3), name="conv_dec", dtype=dt)
            self.upsample_6 = layers.ConvTransposeTF(128, (2, 2), (2, 2), name="upsample_6", dtype=dt)
            self.layer6 = ccp((128, 128), "layer6")
            self.layer7 = ccp((128, 128), "layer7")
            self.upsample_8 = layers.ConvTransposeTF(64, (2, 2), (2, 2), name="upsample_8", dtype=dt)
            self.layer8 = ccp((64, 64), "layer8")
            self.layer9 = ccp((64, 64), "layer9")
            self.upsample_10 = layers.ConvTransposeTF(16, (2, 2), (2, 2), name="upsample_10", dtype=dt)
            self.layer10 = ccp((16, 16), "layer10")
            self.layer11 = ccp((16, 16), "layer11")
            self.upsample_12 = layers.ConvTransposeTF(16, (3, 3), (2, 2), name="upsample_12", dtype=dt)
            self.layer12 = ccp((16, 16), "layer12")
            self.layer13 = ccp((16, 16), "layer13")
            self.final = layers.conv2d(1, (1, 1), name="final", dtype=dt)
        else:
            self.layer1 = ccp((8, 8), "layer1", pool=True, pool_padding="VALID")
            self.layer2 = ccp((8, 8), "layer2", pool=True, pool_padding="VALID", pool_kernel=(3, 2))
            self.layer3 = ccp((32, 32), "layer3", pool=True)
            self.layer4 = ccp((64, 64), "layer4", pool=True)
            self.layer5 = ccp((128, 128), "layer5")
            self.mean_conv = layers.conv2d(128, (6, 16), padding="VALID", name="mean", dtype=dt)
            self.var_conv = layers.conv2d(128, (6, 16), padding="VALID", name="variance", dtype=dt)
            self.dense_dec = layers.dense(6 * 16, name="dense", dtype=dt)
            self.conv_dec = layers.conv2d(128, (3, 3), name="conv_dec", dtype=dt)
            self.upsample_6 = layers.ConvTransposeTF(64, (2, 2), (2, 2), name="upsample_6", dtype=dt)
            self.layer6 = ccp((64, 64), "layer6")
            self.upsample_7 = layers.ConvTransposeTF(32, (2, 2), (2, 2), name="upsample_7", dtype=dt)
            self.layer7 = ccp((32, 32), "layer7")
            self.upsample_8 = layers.ConvTransposeTF(8, (3, 2), (2, 2), name="upsample_8", dtype=dt)
            self.layer8 = ccp((8, 8), "layer8")
            self.upsample_9 = layers.ConvTransposeTF(8, (3, 3), (2, 2), name="upsample_9", dtype=dt)
            self.layer9 = ccp((8, 8), "layer9")
            self.final = layers.conv2d(1, (1, 1), name="final", dtype=dt)

    # ------------------------------------------------------- large variant

    def features(self, x, *, train: bool = True) -> jnp.ndarray:
        """Stage-1 (12,16,128) feature map (large variant only;
        unet_sound22.py split)."""
        assert self.variant == "large"
        _, pool1 = self.layer1(x, train=train)
        _, pool2 = self.layer2(pool1, train=train)
        _, pool3 = self.layer3(pool2, train=train)
        _, pool4 = self.layer4(pool3, train=train)
        return self.layer5(pool4, train=train)

    def decode(self, z, *, train: bool = True) -> jnp.ndarray:
        return nn.sigmoid(self._decode_logits(z, train=train))

    def _decode_logits(self, z, *, train: bool = True) -> jnp.ndarray:
        assert self.variant == "large"
        net = nn.relu(self.dense_dec(z))
        net = net.reshape(-1, 12, 16, 10)
        net = nn.relu(self.conv_dec(net))
        up = self.upsample_6(net)
        up = self.layer6(up, train=train)
        up = self.layer7(up, train=train)
        up = self.upsample_8(up)
        up = self.layer8(up, train=train)
        up = self.layer9(up, train=train)
        up = self.upsample_10(up)
        up = self.layer10(up, train=train)
        up = self.layer11(up, train=train)
        up = self.upsample_12(up)
        up = self.layer12(up, train=train)
        up = self.layer13(up, train=train)
        return self.final(up)

    def from_features(self, conv5, *, sample: bool = True, train: bool = True) -> VaeOutput:
        assert self.variant == "large"
        z, mean, std = self.vae(conv5, sample=sample)
        logits = self._decode_logits(z, train=train)
        return VaeOutput(nn.sigmoid(logits), z, mean, std, conv5,
                         logits=logits)

    # --------------------------------------------------------------- call

    def __call__(self, x, *, sample: bool = True, train: bool = True) -> VaeOutput:
        if self.variant == "large":
            conv5 = self.features(x, train=train)
            return self.from_features(conv5, sample=sample, train=train)
        return self._small(x, sample=sample, train=train)

    def _small(self, x, *, sample, train) -> VaeOutput:
        conv1, pool1 = self.layer1(x, train=train)
        conv2, pool2 = self.layer2(pool1, train=train)
        conv3, pool3 = self.layer3(pool2, train=train)
        conv4, pool4 = self.layer4(pool3, train=train)
        conv5 = self.layer5(pool4, train=train)

        # mean / raw-variance heads (unet_sound.py:65-70 — no softplus).
        mean = self.mean_conv(conv5).reshape(-1, 128)
        variance = self.var_conv(conv5).reshape(-1, 128)
        if sample and self.has_rng("latent"):
            eps = jax.random.normal(self.make_rng("latent"), variance.shape, variance.dtype)
            z = mean + variance * eps
        else:
            z = mean

        net = nn.relu(self.dense_dec(z))
        net = net.reshape(-1, 6, 16, 1)
        net = nn.relu(self.conv_dec(net))
        up = self.upsample_6(net)
        up = self.layer6(jnp.concatenate([up, conv4], -1), train=train)
        up = self.upsample_7(up)
        up = self.layer7(jnp.concatenate([up, conv3], -1), train=train)
        up = self.upsample_8(up)
        up = self.layer8(jnp.concatenate([up, conv2], -1), train=train)
        up = self.upsample_9(up)
        up = self.layer9(jnp.concatenate([up, conv1], -1), train=train)
        logits = self.final(up)
        return VaeOutput(nn.sigmoid(logits), z, mean, variance, conv5,
                         logits=logits)
