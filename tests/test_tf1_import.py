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


# ---------------------------------------------------------------- export


def test_export_roundtrip_every_convention(tmp_path):
    """core/tf1_export writes reference-named checkpoints: every naming
    convention (tf.layers, slim, BN, deconv layout, resnet unit scopes,
    VGGish repeat scopes, VAE heads) round-trips export -> real TF
    checkpoint -> tf1_import strict-merge back to the original values."""
    from acoustic_image_generation_tpu.core.tf1_export import (
        export_scope,
        save_tf1_checkpoint,
    )

    rng = np.random.default_rng(1)
    f32 = lambda *s: rng.normal(size=s).astype(np.float32)

    unet_params = {
        "layer1": {
            "conv_1": {"kernel": f32(3, 3, 12, 128), "bias": f32(128)},
            "bn_1": {"scale": f32(128), "bias": f32(128)},
        },
        "upsample_1": {"kernel": f32(2, 2, 256, 128)},  # flax HWIO (in=256)
        "dense": {"kernel": f32(150, 2304), "bias": f32(2304)},
        "vae": {"mean": {"kernel": f32(12, 16, 133, 150), "bias": f32(150)}},
        "conv_dec": {"kernel": f32(3, 3, 150, 133), "bias": f32(133)},
    }
    unet_stats = {"layer1": {"bn_1": {"mean": f32(128), "var": np.abs(f32(128))}}}
    resnet_params = {
        "conv1": {  # fixed-pad root conv: bare kernel + BN (slim names)
            "kernel": f32(7, 7, 3, 64),
            "BatchNorm": {"scale": f32(64), "bias": f32(64)},
        },
        "block2_unit_4": {
            "conv1": {
                "conv": {"kernel": f32(1, 1, 256, 128)},  # _ConvBN wrapper
                "BatchNorm": {"scale": f32(128), "bias": f32(128)},
            }
        },
    }
    resnet_stats = {
        "conv1": {"BatchNorm": {"mean": f32(64), "var": np.abs(f32(64))}}
    }
    vggish_params = {"conv3_1": {"kernel": f32(3, 3, 128, 256), "bias": f32(256)}}
    dualcam_params = {"full1": {"kernel": f32(128, 1000), "bias": f32(1000)}}

    tensors = export_scope(
        {"params": unet_params, "batch_stats": unet_stats}, "UNetAcRes"
    )
    tensors.update(
        export_scope(
            {"params": resnet_params, "batch_stats": resnet_stats},
            "resnet_v1_50",
            slim=True,
        )
    )
    tensors.update(export_scope({"params": vggish_params}, "vggish", slim=True))
    tensors.update(export_scope({"params": dualcam_params}, "DualCamNet", slim=True))

    path = save_tf1_checkpoint(str(tmp_path / "exported.ckpt"), tensors, global_step=5)
    ckpt = load_tf1_checkpoint(path)

    # the exact names the reference's tf.train.Saver would have written
    expected = {
        "UNetAcRes/layer1/conv_1/kernel",
        "UNetAcRes/layer1/conv_1/bias",
        "UNetAcRes/layer1/bn_1/gamma",
        "UNetAcRes/layer1/bn_1/beta",
        "UNetAcRes/layer1/bn_1/moving_mean",
        "UNetAcRes/layer1/bn_1/moving_variance",
        "UNetAcRes/upsample_1/kernel",
        "UNetAcRes/dense/kernel",
        "UNetAcRes/dense/bias",
        "UNetAcRes/mean/kernel",
        "UNetAcRes/mean/bias",
        "UNetAcRes/conv2d/kernel",
        "UNetAcRes/conv2d/bias",
        "resnet_v1_50/conv1/weights",
        "resnet_v1_50/conv1/BatchNorm/gamma",
        "resnet_v1_50/conv1/BatchNorm/beta",
        "resnet_v1_50/conv1/BatchNorm/moving_mean",
        "resnet_v1_50/conv1/BatchNorm/moving_variance",
        "resnet_v1_50/block2/unit_4/bottleneck_v1/conv1/weights",
        "resnet_v1_50/block2/unit_4/bottleneck_v1/conv1/BatchNorm/gamma",
        "resnet_v1_50/block2/unit_4/bottleneck_v1/conv1/BatchNorm/beta",
        "vggish/conv3/conv3_1/weights",
        "vggish/conv3/conv3_1/biases",
        "DualCamNet/full1/weights",
        "DualCamNet/full1/biases",
        "global_step",
    }
    assert expected <= set(ckpt)
    # deconv kernels stored in TF's (kh, kw, out, in) layout
    assert ckpt["UNetAcRes/upsample_1/kernel"].shape == (2, 2, 128, 256)
    assert int(ckpt["global_step"]) == 5

    # round-trip through the importer, strict against the original trees
    p, s = import_scope(ckpt, "UNetAcRes")
    assert_trees_equal(merge_into(unet_params, p, strict=True), unet_params)
    assert_trees_equal(merge_into(unet_stats, s, strict=True), unet_stats)
    p, s = import_scope(ckpt, "resnet_v1_50")
    assert_trees_equal(merge_into(resnet_params, p, strict=True), resnet_params)
    assert_trees_equal(merge_into(resnet_stats, s, strict=True), resnet_stats)
    p, _ = import_scope(ckpt, "vggish")
    assert_trees_equal(merge_into(vggish_params, p, strict=True), vggish_params)
    p, _ = import_scope(ckpt, "DualCamNet")
    assert_trees_equal(merge_into(dualcam_params, p, strict=True), dualcam_params)


def assert_trees_equal(a, b):
    import jax

    same = jax.tree_util.tree_map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)), a, b
    )
    assert jax.tree_util.tree_all(same), same


def test_export_real_model_roundtrip(tmp_path):
    """A real flax model's init variables survive export -> TF checkpoint
    -> import bit-for-bit (UNetAcoustic: convs, BN-less pools, VAE head,
    the unnamed decoder conv, deconv layout)."""
    import jax

    from acoustic_image_generation_tpu.core.tf1_export import (
        export_scope,
        save_tf1_checkpoint,
    )
    from acoustic_image_generation_tpu.models import UNetAcoustic

    x = np.zeros((1, 36, 48, 12), np.float32)
    model = UNetAcoustic()
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x
    )
    tensors = export_scope({"params": variables["params"]}, "UNetAcoustic")
    path = save_tf1_checkpoint(str(tmp_path / "unetac.ckpt"), tensors)

    ckpt = load_tf1_checkpoint(path)
    params, _ = import_scope(ckpt, "UNetAcoustic")
    merged = merge_into(variables["params"], params, strict=True)
    assert_trees_equal(merged, variables["params"])


def test_export_generation_checkpoint_wiring(tmp_path):
    """The flagship convenience writes one checkpoint with both reference
    scopes (UNetAcRes tf.layers names + resnet_v1_50 slim names) and the
    reference's global_step convention (= epoch counter,
    trainer/trainer.py:250)."""
    from acoustic_image_generation_tpu.core.tf1_export import (
        export_generation_checkpoint,
    )

    rng = np.random.default_rng(2)
    f32 = lambda *s: rng.normal(size=s).astype(np.float32)
    params = {
        "generator": {"layer1": {"conv_1": {"kernel": f32(3, 3, 12, 128),
                                            "bias": f32(128)}}},
        "resnet": {"conv1": {"kernel": f32(7, 7, 3, 64),
                             "BatchNorm": {"scale": f32(64), "bias": f32(64)}}},
    }
    stats = {"resnet": {"conv1": {"BatchNorm": {"mean": f32(64),
                                                "var": np.abs(f32(64))}}}}
    path = export_generation_checkpoint(
        params, stats, str(tmp_path / "flagship.ckpt"), global_step=9
    )
    ckpt = load_tf1_checkpoint(path)
    assert "UNetAcRes/layer1/conv_1/kernel" in ckpt
    assert "resnet_v1_50/conv1/weights" in ckpt
    assert "resnet_v1_50/conv1/BatchNorm/moving_variance" in ckpt
    assert int(ckpt["global_step"]) == 9


def test_export_state_embed_modalities(tmp_path):
    """export_state writes the embed recipes' per-modality VAE scopes
    (the reference's acoustic/audio/visual_init_checkpoint warm-start
    format) and skips non-reference keys like associators."""
    from acoustic_image_generation_tpu.core.tf1_export import export_state

    rng = np.random.default_rng(3)
    conv = lambda cin, cout: {
        "kernel": rng.normal(size=(3, 3, cin, cout)).astype(np.float32),
        "bias": rng.normal(size=(cout,)).astype(np.float32),
    }
    params = {
        "acoustic": {"layer1": {"conv_1": conv(12, 128)}},
        "audio": {"layer1": {"conv_1": conv(1, 16)}},
        "video": {"layer1": {"conv_1": conv(3, 32)}},
        "associator": {"dense": conv(8, 8)},  # no reference checkpoint scope
    }
    path = export_state(params, None, str(tmp_path / "embed.ckpt"))
    ckpt = load_tf1_checkpoint(path)
    assert "UNetAcoustic/layer1/conv_1/kernel" in ckpt
    assert "UNetAudio/layer1/conv_1/kernel" in ckpt
    assert "UNet/layer1/conv_1/kernel" in ckpt
    assert not any("associator" in n.lower() for n in ckpt)

    with pytest.raises(ValueError, match="no exportable"):
        export_state({"associator": {}}, None, str(tmp_path / "x.ckpt"))
