"""TF1 checkpoint importer + TF-oracle tests for the conv shims.

TensorFlow is present in this image, so we (a) write a real TF1-style
checkpoint with reference-shaped variable names and import it, and (b) use
TF itself as the numerical oracle for the quirky conv2d_transpose shape
semantics our decoders rely on."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from acoustic_image_generation_tpu.core.tf1_import import (  # noqa: E402
    import_scope,
    load_tf1_checkpoint,
    merge_into,
)
from acoustic_image_generation_tpu.ops.tf_compat import conv_transpose_tf  # noqa: E402


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    """Write a checkpoint with one variable per naming convention used by
    the reference zoo."""
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp("ckpt") / "epoch_3.ckpt")
    variables = {
        # tf.layers conv / dense / deconv (UNetAcRes style)
        "UNetAcRes/layer1/conv_1/kernel": rng.normal(size=(3, 3, 12, 128)).astype(np.float32),
        "UNetAcRes/layer1/conv_1/bias": rng.normal(size=(128,)).astype(np.float32),
        "UNetAcRes/upsample_1/kernel": rng.normal(size=(2, 2, 128, 256)).astype(np.float32),
        "UNetAcRes/dense/kernel": rng.normal(size=(150, 2304)).astype(np.float32),
        "UNetAcRes/dense/bias": rng.normal(size=(2304,)).astype(np.float32),
        # tf.layers batch norm (UNetAudio style)
        "UNetAudio/layer1/bn_1/gamma": rng.normal(size=(16,)).astype(np.float32),
        "UNetAudio/layer1/bn_1/beta": rng.normal(size=(16,)).astype(np.float32),
        "UNetAudio/layer1/bn_1/moving_mean": rng.normal(size=(16,)).astype(np.float32),
        "UNetAudio/layer1/bn_1/moving_variance": rng.random(16).astype(np.float32),
        # slim resnet style
        "resnet_v1_50/conv1/weights": rng.normal(size=(7, 7, 3, 64)).astype(np.float32),
        "resnet_v1_50/conv1/BatchNorm/gamma": rng.normal(size=(64,)).astype(np.float32),
        "resnet_v1_50/conv1/BatchNorm/moving_mean": rng.normal(size=(64,)).astype(np.float32),
        "resnet_v1_50/block2/unit_4/bottleneck_v1/conv1/weights": rng.normal(
            size=(1, 1, 256, 128)
        ).astype(np.float32),
        # base.py style (DualCamNet)
        "DualCamNet/full1/weights": rng.normal(size=(128, 1000)).astype(np.float32),
        "DualCamNet/full1/biases": rng.normal(size=(1000,)).astype(np.float32),
        # optimizer slots must be skipped
        "UNetAcRes/layer1/conv_1/kernel/Adam": np.zeros((3, 3, 12, 128), np.float32),
        "global_step": np.asarray(7, np.int64),
    }
    ckpt = tf.train.Checkpoint()
    # write via tf.raw saver API for v1-style flat names
    with tf.Graph().as_default():
        tf_vars = []
        with tf.compat.v1.Session() as sess:
            for name, value in variables.items():
                tf_vars.append(tf.compat.v1.get_variable(name, initializer=value))
            sess.run(tf.compat.v1.global_variables_initializer())
            saver = tf.compat.v1.train.Saver(var_list=tf_vars)
            saver.save(sess, path)
    return path, variables


def test_load_and_scope_import(ckpt_path):
    path, variables = ckpt_path
    ckpt = load_tf1_checkpoint(path)
    assert "UNetAcRes/layer1/conv_1/kernel" in ckpt

    params, stats = import_scope(ckpt, "UNetAcRes")
    np.testing.assert_array_equal(
        params["layer1"]["conv_1"]["kernel"], variables["UNetAcRes/layer1/conv_1/kernel"]
    )
    # deconv kernel layout fixed (kh,kw,out,in) -> (kh,kw,in,out)
    got = params["upsample_1"]["kernel"]
    np.testing.assert_array_equal(
        got, np.transpose(variables["UNetAcRes/upsample_1/kernel"], (0, 1, 3, 2))
    )
    # optimizer slots skipped
    assert "Adam" not in str(params)

    aparams, astats = import_scope(ckpt, "UNetAudio")
    np.testing.assert_array_equal(
        aparams["layer1"]["bn_1"]["scale"], variables["UNetAudio/layer1/bn_1/gamma"]
    )
    np.testing.assert_array_equal(
        astats["layer1"]["bn_1"]["mean"], variables["UNetAudio/layer1/bn_1/moving_mean"]
    )

    rparams, rstats = import_scope(ckpt, "resnet_v1_50")
    # unit names merged; slim conv kernels land as bare 'kernel'
    np.testing.assert_array_equal(
        rparams["block2_unit_4"]["conv1"]["kernel"],
        variables["resnet_v1_50/block2/unit_4/bottleneck_v1/conv1/weights"],
    )
    np.testing.assert_array_equal(
        rstats["conv1"]["BatchNorm"]["mean"],
        variables["resnet_v1_50/conv1/BatchNorm/moving_mean"],
    )

    dparams, _ = import_scope(ckpt, "DualCamNet")
    np.testing.assert_array_equal(
        dparams["full1"]["kernel"], variables["DualCamNet/full1/weights"]
    )
    np.testing.assert_array_equal(
        dparams["full1"]["bias"], variables["DualCamNet/full1/biases"]
    )


def test_merge_into_fixed_pad_retarget(ckpt_path):
    path, variables = ckpt_path
    ckpt = load_tf1_checkpoint(path)
    params, _ = import_scope(ckpt, "resnet_v1_50")
    # template where root conv1 stores a bare kernel (fixed-pad _ConvBN)
    template = {
        "conv1": {
            "kernel": np.zeros((7, 7, 3, 64), np.float32),
            "BatchNorm": {"scale": np.zeros(64, np.float32)},
        },
        "block2_unit_4": {
            "conv1": {"conv": {"kernel": np.zeros((1, 1, 256, 128), np.float32)}}
        },
    }
    merged = merge_into(template, params)
    np.testing.assert_array_equal(merged["conv1"]["kernel"], variables["resnet_v1_50/conv1/weights"])
    np.testing.assert_array_equal(
        merged["block2_unit_4"]["conv1"]["conv"]["kernel"],
        variables["resnet_v1_50/block2/unit_4/bottleneck_v1/conv1/weights"],
    )


def test_merge_shape_mismatch_raises(ckpt_path):
    path, _ = ckpt_path
    ckpt = load_tf1_checkpoint(path)
    params, _ = import_scope(ckpt, "DualCamNet")
    template = {"full1": {"kernel": np.zeros((64, 1000), np.float32)}}
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_into(template, params)


# --------------------------------------------------------------- TF oracle


@pytest.mark.parametrize(
    "h,w,k,s",
    [
        (12, 16, (2, 2), (3, 3)),  # flagship: kernel < stride
        (12, 16, (3, 4), (3, 3)),  # video UNet up6
        (96, 128, (3, 3), (2, 2)),  # unet_sound2 final
    ],
)
def test_conv_transpose_matches_tensorflow(h, w, k, s):
    rng = np.random.default_rng(1)
    cin, cout = 3, 5
    x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
    kernel = rng.normal(size=(*k, cin, cout)).astype(np.float32)  # HWIO

    got = np.asarray(conv_transpose_tf(jnp.asarray(x), jnp.asarray(kernel), s, "VALID"))

    # TF stores deconv kernels as (kh, kw, out, in)
    tf_kernel = np.transpose(kernel, (0, 1, 3, 2))
    out_shape = (2, got.shape[1], got.shape[2], cout)
    expected = tf.nn.conv2d_transpose(
        x, tf_kernel, output_shape=out_shape, strides=[1, *s, 1], padding="VALID"
    ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
