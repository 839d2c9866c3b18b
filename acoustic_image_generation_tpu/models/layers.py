"""Shared linen layers with TF-1 initialization / shape semantics.

Initializers mirror the reference exactly:
- ``tf.contrib.layers.xavier_initializer`` == glorot uniform (UNet convs,
  ``/root/reference/models/unet_acresnet.py:165``).
- ``tf.layers.conv2d``/``dense`` defaults == glorot uniform too.
- ``models/base.py`` layers use ``truncated_normal(stddev=0.01)``
  (``/root/reference/models/base.py:9,23,60``) — DualCamNet.

Compute dtype is configurable (bfloat16 on TPU keeps the MXU fed); params
are always float32.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import glorot_uniform, truncated_normal
from flax.linen.initializers import zeros_init

from acoustic_image_generation_tpu.ops.tf_compat import conv_transpose_tf

xavier = glorot_uniform


def trunc_normal_001():
    """``tf.truncated_normal_initializer(0.0, 0.01)``. TF truncates at two
    *raw* stddevs and does not rescale; jax's truncated_normal matches."""
    return truncated_normal(stddev=0.01)


class ConvTransposeTF(nn.Module):
    """``tf.layers.conv2d_transpose`` (VALID padding default) as a module.

    Weight layout is HWIO (kh, kw, in, out); see
    ``ops.tf_compat.conv_transpose_tf`` for the shape rule that differs
    from ``nn.ConvTranspose``.
    """

    features: int
    kernel_size: tuple[int, int] = (2, 2)
    strides: tuple[int, int] = (2, 2)
    padding: str = "VALID"
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            xavier(),
            (*self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        y = conv_transpose_tf(
            x.astype(dtype), kernel.astype(dtype), self.strides, self.padding
        )
        if self.use_bias:
            bias = self.param("bias", zeros_init(), (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


def conv2d(
    features: int,
    kernel_size: Sequence[int] = (3, 3),
    strides: Sequence[int] = (1, 1),
    padding: str = "SAME",
    *,
    name: str | None = None,
    dtype=None,
    use_bias: bool = True,
    kernel_init=None,
) -> nn.Conv:
    """``tf.layers.conv2d`` equivalent (glorot-uniform kernel, zero bias)."""
    return nn.Conv(
        features=features,
        kernel_size=tuple(kernel_size),
        strides=tuple(strides),
        padding=padding,
        use_bias=use_bias,
        kernel_init=kernel_init or xavier(),
        bias_init=zeros_init(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def dense(features: int, *, name: str | None = None, dtype=None, kernel_init=None) -> nn.Dense:
    """``tf.layers.dense`` equivalent."""
    return nn.Dense(
        features=features,
        kernel_init=kernel_init or xavier(),
        bias_init=zeros_init(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def batch_norm(train: bool, *, name: str | None = None, dtype=None) -> nn.BatchNorm:
    """``tf.layers.batch_normalization`` defaults: momentum .99, eps 1e-3
    (UNetSound blocks, ``/root/reference/models/unet_sound2.py:161-176``)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.99,
        epsilon=1e-3,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def max_pool_valid(x, window: tuple[int, int], strides: tuple[int, int]):
    """``tf.nn.max_pool`` with VALID padding (base.buildMaxPooling)."""
    return nn.max_pool(x, window_shape=window, strides=strides, padding="VALID")


def minmax_norm(x, axes, eps: float = 0.0):
    """Per-sample min-max normalization onto [0, 1] over ``axes``.

    The reference uses this pattern pervasively (feature-map normalization
    before concat, ``unet_acresnet.py:55-58``; data normalization,
    ``outdoor_data_mfcc.py:672-703``). No epsilon in the reference; pass
    ``eps`` where a degenerate all-constant input must not NaN.
    """
    x = x - jnp.min(x, axis=axes, keepdims=True)
    return x / (jnp.max(x, axis=axes, keepdims=True) + eps)
