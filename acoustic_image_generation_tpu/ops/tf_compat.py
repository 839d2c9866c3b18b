"""TF-1.x layer semantics on top of ``jax.lax`` convolutions.

The reference model zoo is written against ``tf.layers`` / tf-slim, whose
shape rules differ from JAX's defaults in two places that the architectures
load-bear on:

1. ``tf.layers.conv2d_transpose`` with its default ``padding='valid'``
   produces ``out = in * stride + max(kernel - stride, 0)`` — NOT the
   ``(in - 1) * stride + kernel`` of ``jax.lax.conv_transpose``. The
   flagship decoder's stride-3 / kernel-2 upsample
   (``/root/reference/models/unet_acresnet.py:86,200-217``) maps 12x16 ->
   36x48 only under the TF rule (the two rules differ exactly when
   kernel < stride).
2. tf-slim's ``resnet_utils.conv2d_same`` (used by the stride-2 convs of
   the ResNet trunk) applies *fixed* symmetric-ish padding
   ``(k-1)//2, k-1-(k-1)//2`` followed by a VALID conv, so the output
   size is input-size independent.

Plain stride-1/2 ``SAME`` convs need no shim: XLA's string ``'SAME'``
padding follows the same asymmetric-extra-on-the-right rule as TF.

Everything here is shape/layout logic around a single
``lax.conv_general_dilated`` call; XLA fuses and tiles it onto the MXU.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

_DN_NHWC = ("NHWC", "HWIO", "NHWC")


def deconv_output_length(input_length: int, kernel: int, stride: int, padding: str) -> int:
    """TF ``deconv_output_length`` (keras conv_utils) for one spatial dim."""
    padding = padding.upper()
    if padding == "VALID":
        return input_length * stride + max(kernel - stride, 0)
    if padding == "SAME":
        return input_length * stride
    raise ValueError(f"unknown padding {padding!r}")


def _deconv_pad(in_len: int, kernel: int, stride: int, padding: str) -> tuple[int, int]:
    """Explicit (lo, hi) padding for the stride-1 conv over the
    ``stride``-dilated input that realises TF's transposed conv.

    Derivation: the transposed conv is the input-gradient of a forward conv
    ``out -> in`` with the given padding. With dilated length
    ``D = (in-1)*stride + 1`` and forward low padding ``pad_lo``:
    ``p_lo = kernel - 1 - pad_lo`` and ``p_hi`` is whatever makes the output
    length match ``deconv_output_length``.
    """
    out_len = deconv_output_length(in_len, kernel, stride, padding)
    if padding.upper() == "VALID":
        fwd_pad_lo = 0
    else:  # SAME forward conv over out_len with stride
        total = max((in_len - 1) * stride + kernel - out_len, 0)
        fwd_pad_lo = total // 2
    dilated = (in_len - 1) * stride + 1
    p_lo = kernel - 1 - fwd_pad_lo
    p_hi = out_len - (dilated + p_lo - kernel + 1)
    return p_lo, p_hi


def conv_transpose_tf(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: tuple[int, int],
    padding: str = "VALID",
    *,
    precision=None,
    preferred_element_type=None,
) -> jnp.ndarray:
    """``tf.layers.conv2d_transpose`` on NHWC input.

    Args:
      x: (N, H, W, Cin).
      kernel: (kh, kw, Cin, Cout) — note flax-natural HWIO layout, i.e. the
        spatial transpose of TF's stored ``[kh, kw, Cout, Cin]``; the TF1
        checkpoint importer permutes axes on load.
      strides: (sh, sw).
      padding: 'VALID' (the reference always uses the TF default) or 'SAME'.
    """
    kh, kw = int(kernel.shape[0]), int(kernel.shape[1])
    sh, sw = strides
    pad_h = _deconv_pad(int(x.shape[1]), kh, sh, padding)
    pad_w = _deconv_pad(int(x.shape[2]), kw, sw, padding)
    # Fractionally-strided conv with a spatially flipped kernel == gradient
    # of the forward conv == TF's transposed conv.
    flipped = kernel[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DN_NHWC,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )


def conv2d_same_fixed_pad(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    *,
    precision=None,
    preferred_element_type=None,
) -> jnp.ndarray:
    """tf-slim ``resnet_utils.conv2d_same``: fixed explicit padding + VALID.

    For stride 1 this equals a plain SAME conv; for stride > 1 it pads
    ``(k-1)//2`` low / ``k-1-(k-1)//2`` high regardless of input size
    (``/root/reference/models/resnet_utils (tf-slim)``, used by the root
    7x7/2 conv and every stride-2 bottleneck of ``resnet50.py``).
    """
    k = int(kernel.shape[0])
    if stride == 1:
        padding = "SAME"
    else:
        pad_beg = (k - 1) // 2
        pad_end = k - 1 - pad_beg
        padding = ((pad_beg, pad_end), (pad_beg, pad_end))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN_NHWC,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
