from acoustic_image_generation_tpu.ops.tf_compat import (
    conv2d_same_fixed_pad,
    conv_transpose_tf,
    deconv_output_length,
)

__all__ = [
    "conv2d_same_fixed_pad",
    "conv_transpose_tf",
    "deconv_output_length",
]
