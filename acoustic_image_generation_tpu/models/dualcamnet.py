"""DualCamNet acoustic-image classifier.

Port of ``DualCamHybridModel._build_network``
(``/root/reference/models/dualcamnet.py:75-121``): a 12-tap temporal conv3d
over the frame axis, two 5x5 conv stages with a stride-3 max-pool between,
global spatial sum-pooling, then FC 1000 -> FC num_classes. All weights are
truncated-normal(0.01), biases zero (``models/base.py:9,23,60``).

Input is (N*F, 36, 48, C) frame-major like the reference feeds it; logits
are per frame — the classification recipes average logits over the 12
frames of each clip (``/root/reference/trainer/trainer_class.py:47-54``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from flax.linen.initializers import zeros_init

from acoustic_image_generation_tpu.models.layers import max_pool_valid, trunc_normal_001


class DualCamNet(nn.Module):
    num_classes: int = 10
    num_frames: int = 12
    channels: int = 12
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        del train
        dt = self.dtype
        n_frames, h, w, c = self.num_frames, x.shape[1], x.shape[2], x.shape[3]
        # ---- temporal conv3d 12x1x1 over the frame axis (dualcamnet.py:82-84)
        net = x.reshape(-1, n_frames, h, w, c)
        net = nn.Conv(
            c,
            (12, 1, 1),
            padding="SAME",
            kernel_init=trunc_normal_001(),
            bias_init=zeros_init(),
            dtype=dt,
            param_dtype=jnp.float32,
            name="conv1",
        )(net)
        net = nn.relu(net)
        net = net.reshape(-1, h, w, c)
        # ---- conv2 5x5 -> 32, max-pool 3/3 (dualcamnet.py:90-92)
        net = nn.Conv(
            32, (5, 5), padding="SAME",
            kernel_init=trunc_normal_001(), bias_init=zeros_init(),
            dtype=dt, param_dtype=jnp.float32, name="conv2",
        )(net)
        net = nn.relu(net)
        net = max_pool_valid(net, (3, 3), (3, 3))
        # ---- conv3 5x5 -> 128, global sum-pool (dualcamnet.py:94-97)
        net = nn.Conv(
            128, (5, 5), padding="SAME",
            kernel_init=trunc_normal_001(), bias_init=zeros_init(),
            dtype=dt, param_dtype=jnp.float32, name="conv3",
        )(net)
        net = nn.relu(net)
        net = jnp.sum(net, axis=(1, 2))
        # ---- FC 1000 -> FC num_classes (dualcamnet.py:98-106)
        net = nn.Dense(
            1000,
            kernel_init=trunc_normal_001(), bias_init=zeros_init(),
            dtype=dt, param_dtype=jnp.float32, name="full1",
        )(net)
        net = nn.relu(net)
        logits = nn.Dense(
            self.num_classes,
            kernel_init=trunc_normal_001(), bias_init=zeros_init(),
            dtype=dt, param_dtype=jnp.float32, name="full3",
        )(net)
        return logits


def clip_logits(frame_logits: jnp.ndarray, num_frames: int = 12) -> jnp.ndarray:
    """Mean per-clip logits over frames
    (``trainer_class.py:47-48``): (N*F, K) -> (N, K)."""
    k = frame_logits.shape[-1]
    return jnp.mean(frame_logits.reshape(-1, num_frames, k), axis=1)
