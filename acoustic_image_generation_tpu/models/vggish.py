"""VGGish audio embedding network (AudioSet), frozen feature extractor.

Port of ``/root/reference/models/vggish.py:35-77``: 96x64 log-mel patch ->
VGG stack (64/128/256x2/512x2 convs, 2x2 SAME max-pools) -> 2x FC 4096 ->
(N, 1, 1, 4096) embedding. The reference keeps it untrainable
(``trainable=False``) and never wires it into a trainer (dead code kept for
capability parity / audio-frontend plans); here the freeze is a trainer
decision (optax label), not a model property.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from flax.linen.initializers import zeros_init

from acoustic_image_generation_tpu.models.layers import trunc_normal_001

NUM_FRAMES = 96
NUM_BANDS = 64
EMBEDDING_SIZE = 128


class VGGish(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        """x: (N, 96, 64) or (N, 96, 64, 1) log-mel patches -> (N,1,1,4096)."""
        dt = self.dtype
        if x.ndim == 3:
            x = x[..., None]

        def conv(net, ch, name):
            net = nn.Conv(
                ch, (3, 3), padding="SAME",
                kernel_init=trunc_normal_001(), bias_init=zeros_init(),
                dtype=dt, param_dtype=jnp.float32, name=name,
            )(net)
            return nn.relu(net)

        net = conv(x, 64, "conv1")
        net = nn.max_pool(net, (2, 2), strides=(2, 2), padding="SAME")
        net = conv(net, 128, "conv2")
        net = nn.max_pool(net, (2, 2), strides=(2, 2), padding="SAME")
        net = conv(net, 256, "conv3_1")
        net = conv(net, 256, "conv3_2")
        net = nn.max_pool(net, (2, 2), strides=(2, 2), padding="SAME")
        net = conv(net, 512, "conv4_1")
        net = conv(net, 512, "conv4_2")
        net = nn.max_pool(net, (2, 2), strides=(2, 2), padding="SAME")
        net = net.reshape(net.shape[0], -1)  # (N, 6*4*512)
        for i in (1, 2):
            net = nn.Dense(
                4096,
                kernel_init=trunc_normal_001(), bias_init=zeros_init(),
                dtype=dt, param_dtype=jnp.float32, name=f"fc1_{i}",
            )(net)
            net = nn.relu(net)
        return net.reshape(-1, 1, 1, 4096)
