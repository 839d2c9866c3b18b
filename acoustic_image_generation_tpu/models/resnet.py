"""ResNet-50 v1 visual trunk, modified as in the reference.

Port of the *behavior* of ``/root/reference/models/resnet50.py`` (a forked
tf-slim resnet_v1) + ``models/vision.py``:

- block1 stride 1 and block4 stride 1 (overall stride 16 instead of 32,
  ``resnet50.py:261-266``);
- an extra ``conv_map`` head: 12-channel (3,4) VALID conv over the 14x19
  block4 output, yielding a 12x16x12 feature map aligned to the acoustic
  image bottleneck lattice (``resnet50.py:208-209``);
- slim ``resnet_arg_scope`` semantics: every conv is followed by
  BN(decay .997, eps 1e-5, scale) and ReLU unless disabled, no conv biases,
  He (variance-scaling 2.0 fan-in truncated-normal) init, weight decay 5e-4
  accounted for in ``losses.regularization`` (``vision.py:54``);
- stride-2 convs use slim's fixed-pad ``conv2d_same`` so shapes are
  input-size independent (``ops.tf_compat.conv2d_same_fixed_pad``).

Input 224x298x3 -> conv_map 12x16x12. Param tree mirrors TF scopes
(``block2/unit_4/shortcut`` etc.) so the TF1 checkpoint importer can map
ImageNet weights 1:1.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

from acoustic_image_generation_tpu.ops.tf_compat import conv2d_same_fixed_pad

he_trunc = variance_scaling(2.0, "fan_in", "truncated_normal")

# (base_depth, num_units, stride) per block — resnet50.py:261-266, with the
# reference's modified strides.
RESNET50_BLOCKS = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 1))


class _Conv1x1Stats(nn.Module):
    """1x1 stride-1 conv via the Pallas fused-stats GEMM. Parameter path
    ("conv"/"kernel", shape (1,1,Cin,Cout)) matches nn.Conv exactly, so the
    same checkpoint drives either implementation."""

    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        from acoustic_image_generation_tpu.ops.pallas_conv_stats import (
            conv1x1_batch_stats,
        )

        kernel = self.param(
            "kernel", he_trunc, (1, 1, x.shape[-1], self.features), jnp.float32
        )
        return conv1x1_batch_stats(x.astype(self.dtype), kernel.astype(self.dtype))


class _TrainBN(nn.Module):
    """Batch norm applied with externally computed batch statistics.
    Variable paths/shapes match flax nn.BatchNorm ("scale"/"bias" params,
    "mean"/"var" batch_stats), so checkpoints are interchangeable."""

    momentum: float
    epsilon: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, y, mean, var):
        c = y.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        inv = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return (y - mean.astype(self.dtype)) * inv + bias.astype(self.dtype)


class _ConvBN(nn.Module):
    """slim ``layers.conv2d`` under resnet_arg_scope: conv (no bias) -> BN
    [-> ReLU]. ``fixed_pad`` selects conv2d_same semantics for stride > 1.
    ``fused_stats`` routes train-mode 1x1/stride-1 convs through the Pallas
    fused-stats GEMM (ops/pallas_conv_stats) — identical variable tree,
    forward-only (pair with ``freeze_trunk``)."""

    features: int
    kernel: tuple[int, int] = (1, 1)
    stride: int = 1
    relu: bool = True
    fixed_pad: bool = False
    padding: str = "SAME"
    fused_stats: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.dtype or x.dtype
        fused = (
            self.fused_stats
            and train
            and not self.fixed_pad
            and self.kernel == (1, 1)
            and self.stride == 1
        )
        if fused:
            y, mean, var = _Conv1x1Stats(self.features, dtype=dt, name="conv")(x)
            y = _TrainBN(momentum=0.997, epsilon=1e-5, dtype=dt, name="BatchNorm")(
                y, mean, var
            )
            return nn.relu(y) if self.relu else y
        if self.fixed_pad:
            kernel = self.param(
                "kernel", he_trunc, (*self.kernel, x.shape[-1], self.features), jnp.float32
            )
            y = conv2d_same_fixed_pad(x.astype(dt), kernel.astype(dt), self.stride)
        else:
            y = nn.Conv(
                self.features,
                self.kernel,
                strides=(self.stride, self.stride),
                padding=self.padding,
                use_bias=False,
                kernel_init=he_trunc,
                dtype=dt,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.997,
            epsilon=1e-5,
            use_scale=True,
            dtype=dt,
            param_dtype=jnp.float32,
            name="BatchNorm",
        )(y)
        return nn.relu(y) if self.relu else y


class BottleneckV1(nn.Module):
    """resnet_v1 bottleneck unit (``resnet50.py:75-125``)."""

    depth: int
    depth_bottleneck: int
    stride: int
    fused_stats: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        depth_in = x.shape[-1]
        fs = self.fused_stats
        if self.depth == depth_in:
            # subsample: 1x1 max-pool with stride (resnet_utils.subsample)
            shortcut = (
                x
                if self.stride == 1
                else nn.max_pool(x, (1, 1), strides=(self.stride, self.stride), padding="VALID")
            )
        else:
            shortcut = _ConvBN(
                self.depth, (1, 1), self.stride, relu=False, name="shortcut",
                fused_stats=fs, dtype=self.dtype
            )(x, train=train)
        residual = _ConvBN(
            self.depth_bottleneck, (1, 1), 1, name="conv1", fused_stats=fs,
            dtype=self.dtype
        )(x, train=train)
        residual = _ConvBN(
            self.depth_bottleneck,
            (3, 3),
            self.stride,
            fixed_pad=self.stride > 1,
            name="conv2",
            dtype=self.dtype,
        )(residual, train=train)
        residual = _ConvBN(
            self.depth, (1, 1), 1, relu=False, name="conv3", fused_stats=fs,
            dtype=self.dtype
        )(residual, train=train)
        return nn.relu(shortcut + residual)


class ResNet50(nn.Module):
    """Stride-16 ResNet-50 v1 with 12-channel ``conv_map`` head.

    ``__call__`` returns the conv_map feature (the generator conditioning
    signal) or, with ``num_classes`` set, classification logits like the
    reference's unused logits head (``vision.py:55``).
    """

    num_classes: int | None = None
    global_pool: bool = False
    # Override for reduced-depth variants (e.g. 1 unit/block in CPU-mesh
    # dry runs — identical strides, conv_map geometry, and sharding
    # structure, far cheaper to compile on hostless test machines).
    blocks: tuple[tuple[int, int, int], ...] = RESNET50_BLOCKS
    # Rematerialize each bottleneck unit on the backward pass: activation
    # HBM drops from ~21 GB to well under v5e's 16 GB at 384-frame batches,
    # buying batch (and throughput) for ~1/3 extra forward FLOPs.
    remat: bool = False
    # The reference NEVER trains the trunk: every trainer optimizes
    # ``vision.py:70`` ``train_vars`` = logits + conv_map only (the
    # ``train_vars2`` backbone list at ``vision.py:68`` has no consumer —
    # verified by grep over trainer/*.py). ``freeze_trunk`` reproduces that
    # gradient structure with a stop_gradient before conv_map, which also
    # lets XLA drop the whole trunk backward pass (~2/3 of the ResNet
    # FLOPs in the flagship train step). BN statistics still update in
    # train mode, exactly like the reference's UPDATE_OPS dependency
    # (``mfcctrainer.py:75-79``).
    freeze_trunk: bool = False
    # Route train-mode 1x1 convs through the Pallas fused-stats GEMM
    # (ops/pallas_conv_stats): saves the separate BN-stats HBM read pass.
    # Forward-only — requires freeze_trunk.
    fused_bn_stats: bool = False
    # Run the trunk's BatchNorms on running averages even in train mode
    # (the head's conv_map/logits BN still follows ``train``). The
    # reference updates trunk BN stats while training the generator
    # (mfcctrainer.py:75-79 UPDATE_OPS), but since the trunk weights are
    # frozen (vision.py:70 var_list) the stats only re-estimate a fixed
    # function — freezing them is numerically defensible and removes the
    # train-BN second stats pass over every activation (measured 387 ms
    # -> 219 ms trunk forward at 768 frames on v5e). It also makes the
    # trunk a *deterministic* per-frame function, which is what enables
    # trunk-feature caching across epochs (train/feature_cache.py).
    trunk_bn_frozen: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True, mode: str = "full"):
        """``mode``: "full" = trunk + head; "trunk" = stop after the frozen
        boundary (block4 output, the stop_gradient cut); "head" = treat
        ``x`` as a cached trunk feature and apply conv_map(+logits) only.
        The split exists so frozen-trunk training can compute the trunk
        once per frame per dataset instead of once per step."""
        assert mode in ("full", "trunk", "head"), mode
        if mode != "head":
            trunk_train = False if self.trunk_bn_frozen else train
            net = _ConvBN(64, (7, 7), 2, fixed_pad=True, name="conv1", dtype=self.dtype)(
                x, train=trunk_train
            )
            net = nn.max_pool(net, (3, 3), strides=(2, 2), padding="VALID")
            unit_cls = (
                nn.remat(BottleneckV1, static_argnums=(2,)) if self.remat else BottleneckV1
            )
            for b, (base_depth, num_units, block_stride) in enumerate(self.blocks, start=1):
                for u in range(1, num_units + 1):
                    stride = block_stride if u == num_units else 1
                    net = unit_cls(
                        depth=base_depth * 4,
                        depth_bottleneck=base_depth,
                        stride=stride,
                        fused_stats=self.fused_bn_stats,
                        name=f"block{b}_unit_{u}",
                        dtype=self.dtype,
                    )(net, trunk_train)
            if self.freeze_trunk:
                net = jax.lax.stop_gradient(net)
            if mode == "trunk":
                return net
        else:
            net = x if self.dtype is None else x.astype(self.dtype)
        net = _ConvBN(12, (3, 4), 1, padding="VALID", name="conv_map", dtype=self.dtype)(
            net, train=train
        )
        if self.global_pool:
            net = jnp.mean(net, axis=(1, 2), keepdims=True)
        if self.num_classes is not None:
            net = nn.Conv(
                self.num_classes,
                (1, 1),
                use_bias=True,
                kernel_init=he_trunc,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="logits",
            )(net)
        return net
