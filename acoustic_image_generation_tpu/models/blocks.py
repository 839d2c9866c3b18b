"""UNet building blocks.

One parametrized ``ConvConvPool`` / ``VaeHead`` pair replaces the ~12 copies
of ``conv_conv_pool`` / mean-std heads across the reference's model files
(e.g. ``/root/reference/models/unet_acresnet.py:136-184`` without BN,
``/root/reference/models/unet_sound2.py:131-179`` with BN).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.models import layers


class _ConvParams(nn.Module):
    """Parameter-only twin of ``layers.conv2d``: declares the same
    ``kernel``/``bias`` tree under the same scope name, but returns the raw
    arrays so a fused multi-conv Pallas kernel (ops/pallas_conv) can consume
    the whole chain. Checkpoints/TF1 import-export see an identical tree."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param(
            "kernel",
            layers.xavier(),
            (*self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class ConvConvPool(nn.Module):
    """{Conv3x3 -> (BN) -> ReLU} x2 -> optional strided "pool" conv.

    Matches ``conv_conv_pool``: the pool is itself a conv (not max-pool),
    with its own BN in the BN variant. Param names mirror the reference
    scopes (``conv_1``, ``conv_2``, ``pool_2``) so TF1 checkpoints map 1:1.

    ``fused=True`` (no-BN variant only) runs the stride-1 conv+ReLU chain
    through the fused Pallas kernel ``ops.pallas_conv.conv_chain`` on TPU
    backends (one kernel forward, one backward, intermediate activations
    VMEM-resident) and through its dtype-disciplined XLA oracle elsewhere.
    The parameter tree is unchanged.
    """

    filters: tuple[int, ...]
    pool: bool = False
    batch_norm: bool = False
    pool_kernel: tuple[int, int] = (3, 3)
    pool_strides: tuple[int, int] = (2, 2)
    pool_padding: str = "SAME"
    fused: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        if self.fused and not self.batch_norm:
            from acoustic_image_generation_tpu.ops.pallas_conv import conv_chain_auto

            ws, bs = [], []
            in_ch = x.shape[-1]
            for i, f in enumerate(self.filters):
                k, b = _ConvParams(f, name=f"conv_{i + 1}")(in_ch)
                ws.append(k)
                bs.append(b)
                in_ch = f
            dt = self.dtype or x.dtype
            x = conv_chain_auto(
                x.astype(dt), tuple(ws), tuple(bs), (True,) * len(self.filters)
            )
        else:
            for i, f in enumerate(self.filters):
                x = layers.conv2d(f, (3, 3), name=f"conv_{i + 1}", dtype=self.dtype)(x)
                if self.batch_norm:
                    x = layers.batch_norm(train, name=f"bn_{i + 1}", dtype=self.dtype)(x)
                x = nn.relu(x)
        if not self.pool:
            return x
        n = len(self.filters)
        p = layers.conv2d(
            self.filters[-1],
            self.pool_kernel,
            strides=self.pool_strides,
            padding=self.pool_padding,
            name=f"pool_{n}",
            dtype=self.dtype,
        )(x)
        if self.batch_norm:
            p = layers.batch_norm(train, name=f"bn_pool_{n}", dtype=self.dtype)(p)
        p = nn.relu(p)
        return x, p


class VaeHead(nn.Module):
    """mean / softplus-std conv pair over the bottleneck + reparameterization.

    ``mean = conv(x)``, ``std = softplus(conv(x))``, ``z = mean + std*eps``
    (``/root/reference/models/unet_noconc.py:60-65``). In ``embedding``
    (deterministic AE) mode only the mean conv runs, min-max normalized per
    sample (``/root/reference/models/unet_acresnet.py:63-71``).

    Noise comes from the ``latent`` rng collection; pass
    ``deterministic=True`` at eval to use the mean path with z = mean+std*eps
    still sampled by the reference at test time — the reference *always*
    samples (no eval switch), so we default to sampling whenever the rng is
    available and fall back to the mean otherwise.
    """

    latent_dim: int
    spatial: tuple[int, int] = (12, 16)
    embedding: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, sample: bool = True):
        if self.embedding:
            z = layers.conv2d(
                self.latent_dim, self.spatial, padding="VALID", name="mean", dtype=self.dtype
            )(x)
            z = z.reshape(-1, self.latent_dim)
            z = layers.minmax_norm(z, axes=1)
            return z, z, None
        mean = layers.conv2d(
            self.latent_dim, self.spatial, padding="VALID", name="mean", dtype=self.dtype
        )(x)
        mean = mean.reshape(-1, self.latent_dim)
        std = layers.conv2d(
            self.latent_dim, self.spatial, padding="VALID", name="std", dtype=self.dtype
        )(x)
        std = nn.softplus(std.reshape(-1, self.latent_dim))
        if sample and self.has_rng("latent"):
            eps = jax.random.normal(self.make_rng("latent"), std.shape, std.dtype)
            z = mean + std * eps
        else:
            z = mean
        return z, mean, std


def reparameterize(rng, mean, std):
    """Standalone z = mean + std * N(0,1) for trainer-level latent mixing
    (the embed recipes draw ONE noise tensor and reuse it across modalities,
    ``/root/reference/trainer/trainer_three.py:73-103``)."""
    eps = jax.random.normal(rng, std.shape, std.dtype)
    return mean + std * eps
