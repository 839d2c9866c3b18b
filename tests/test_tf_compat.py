"""TF layer-semantics shims: shapes + adjointness.

The transposed conv must be the exact adjoint of the corresponding forward
strided conv (that is how TF defines conv2d_transpose), so we check
``conv_transpose_tf`` against ``jax.vjp`` of a forward VALID conv, and the
output-shape rule against TF's ``deconv_output_length`` table.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acoustic_image_generation_tpu.ops.tf_compat import (
    conv2d_same_fixed_pad,
    conv_transpose_tf,
    deconv_output_length,
)


@pytest.mark.parametrize(
    "in_len,k,s,pad,expected",
    [
        (12, 2, 3, "VALID", 36),  # flagship decoder: kernel < stride
        (16, 2, 3, "VALID", 48),
        (96, 3, 2, "VALID", 193),  # unet_sound2 final upsample
        (12, 2, 2, "VALID", 24),
        (16, 4, 3, "VALID", 49),  # unet video up6 width
        (10, 2, 2, "SAME", 20),
    ],
)
def test_deconv_output_length(in_len, k, s, pad, expected):
    assert deconv_output_length(in_len, k, s, pad) == expected


@pytest.mark.parametrize(
    "h,w,k,s",
    [
        (12, 16, (2, 2), (3, 3)),  # kernel < stride: the TF-only case
        (12, 16, (3, 4), (3, 3)),
        (96, 128, (3, 3), (2, 2)),
        (24, 64, (3, 2), (2, 2)),
    ],
)
def test_conv_transpose_is_adjoint_of_forward_conv(h, w, k, s):
    """conv_transpose_tf(x, K) == (d/dy conv_forward)(x) elementwise."""
    cin, cout = 3, 5
    key = jax.random.key(0)
    kx, kk = jax.random.split(key)
    x = jax.random.normal(kx, (2, h, w, cin))
    kernel = jax.random.normal(kk, (*k, cin, cout))

    out_h = deconv_output_length(h, k[0], s[0], "VALID")
    out_w = deconv_output_length(w, k[1], s[1], "VALID")

    # Forward conv consuming the deconv output: (N, out_h, out_w, cout) -> (N, h, w, cin)
    fwd_kernel = jnp.transpose(kernel, (0, 1, 3, 2))  # HWIO with I=cout

    def forward(y):
        return jax.lax.conv_general_dilated(
            y, fwd_kernel, window_strides=s, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    y0 = jnp.zeros((2, out_h, out_w, cout))
    # Check the forward conv really maps back to (h, w)
    assert forward(y0).shape == (2, h, w, cin)
    _, vjp = jax.vjp(forward, y0)
    (adjoint,) = vjp(x)

    got = conv_transpose_tf(x, kernel, s, "VALID")
    assert got.shape == (2, out_h, out_w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(adjoint), rtol=1e-5, atol=1e-5)


def test_conv2d_same_fixed_pad_shapes():
    x = jnp.zeros((1, 224, 298, 3))
    k = jnp.zeros((7, 7, 3, 64))
    assert conv2d_same_fixed_pad(x, k, 2).shape == (1, 112, 149, 64)
    k3 = jnp.zeros((3, 3, 3, 8))
    assert conv2d_same_fixed_pad(x, k3, 1).shape == (1, 224, 298, 8)
    # stride-2 bottleneck conv on odd sizes: 55 -> 28 (input-size independent)
    x2 = jnp.zeros((1, 55, 74, 4))
    k2 = jnp.zeros((3, 3, 4, 4))
    assert conv2d_same_fixed_pad(x2, k2, 2).shape == (1, 28, 37, 4)
