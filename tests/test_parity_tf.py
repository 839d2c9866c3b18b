"""Checkpoint-level numerical parity of the flagship generator.

Builds the AAAI'21 UNetAcRes (1-skip) computation in TensorFlow v1 API
(fresh construction from the architecture spec — conv/conv/stride-3-pool
encoder, min-max normalized feature concat, (12,16)-VALID mean head,
dense/conv decoder, kernel-2/stride-3 VALID deconv, skip concat, sigmoid),
saves its randomly initialized variables as a TF1 checkpoint, imports them
with ``core.tf1_import``, and checks our flax model reproduces TF's forward
output on the same inputs. This is the "emit bit-comparable tensors vs
reference checkpoints" contract of BASELINE.md, with the latent noise
zeroed on both sides (z = mean)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from acoustic_image_generation_tpu.core.tf1_import import (  # noqa: E402
    import_scope,
    load_tf1_checkpoint,
    merge_into,
)
from acoustic_image_generation_tpu.models import UNetAcResNet  # noqa: E402

v1 = tf.compat.v1


def _conv2d(x, filters, ksize, name, strides=(1, 1), padding="SAME"):
    """tf.layers.conv2d equivalent via raw ops (Keras 3 removed v1.layers):
    glorot-uniform "kernel" + zero "bias" under the layer's scope."""
    with v1.variable_scope(name):
        k = v1.get_variable(
            "kernel", [*ksize, int(x.shape[-1]), filters],
            initializer=v1.glorot_uniform_initializer(),
        )
        b = v1.get_variable("bias", [filters], initializer=tf.zeros_initializer())
        return tf.nn.conv2d(x, k, strides=[1, *strides, 1], padding=padding) + b


def _dense(x, units, name="dense"):
    with v1.variable_scope(name):
        k = v1.get_variable(
            "kernel", [int(x.shape[-1]), units],
            initializer=v1.glorot_uniform_initializer(),
        )
        b = v1.get_variable("bias", [units], initializer=tf.zeros_initializer())
        return tf.matmul(x, k) + b


def _deconv(x, filters, ksize, strides, name):
    """tf.layers.conv2d_transpose equivalent (VALID): kernel stored
    (kh, kw, out, in) like TF layers."""
    with v1.variable_scope(name):
        k = v1.get_variable(
            "kernel", [ksize, ksize, filters, int(x.shape[-1])],
            initializer=v1.glorot_uniform_initializer(),
        )
        b = v1.get_variable("bias", [filters], initializer=tf.zeros_initializer())
        out_h = int(x.shape[1]) * strides + max(ksize - strides, 0)
        out_w = int(x.shape[2]) * strides + max(ksize - strides, 0)
        y = tf.nn.conv2d_transpose(
            x, k, output_shape=[tf.shape(x)[0], out_h, out_w, filters],
            strides=[1, strides, strides, 1], padding="VALID",
        )
        return y + b


def _conv_conv_pool(net, filters, name, pool=False):
    with v1.variable_scope(f"layer{name}"):
        for i in range(2):
            net = tf.nn.relu(_conv2d(net, filters, (3, 3), f"conv_{i + 1}"))
        if not pool:
            return net
        p = _conv2d(net, filters, (3, 3), "pool_2", strides=(3, 3))
        return net, tf.nn.relu(p)


def _minmax(x):
    x = x - tf.reduce_min(x, axis=[1, 2, 3], keepdims=True)
    return x / tf.reduce_max(x, axis=[1, 2, 3], keepdims=True)


def _build_tf_unet_acres(mfccmap, feat):
    with v1.variable_scope("UNetAcRes"):
        conv1, pool1 = _conv_conv_pool(mfccmap, 128, "1", pool=True)
        conv2_0 = _conv_conv_pool(pool1, 133, "2")
        conv2 = tf.concat([_minmax(conv2_0), _minmax(feat)], axis=-1)
        mean = _conv2d(conv2, 150, (12, 16), "mean", padding="VALID")
        mean = tf.reshape(mean, (-1, 150))
        # std head exists in the checkpoint but z = mean for the parity run
        _ = _conv2d(conv2, 150, (12, 16), "std", padding="VALID")
        net = tf.nn.relu(_dense(mean, 12 * 16 * 12))
        net = tf.reshape(net, (-1, 12, 16, 12))
        net = tf.nn.relu(_conv2d(net, 133, (3, 3), "conv2d"))
        conv4 = _conv_conv_pool(net, 128, "4")
        conv5 = _conv_conv_pool(conv4, 128, "5")
        up1 = _deconv(conv5, 128, 2, 3, "upsample_1")
        up1 = tf.concat([up1, conv1], axis=-1)
        conv6 = _conv_conv_pool(up1, 128, "6")
        conv7 = _conv_conv_pool(conv6, 64, "7")
        out = tf.sigmoid(_conv2d(conv7, 12, (3, 3), "final"))
    return out


@pytest.mark.slow
def test_flagship_generator_matches_tf_checkpoint(tmp_path):
    rng = np.random.default_rng(0)
    mfccmap_np = rng.random((2, 36, 48, 12)).astype(np.float32)
    feat_np = rng.random((2, 12, 16, 12)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetacres.ckpt")
    with tf.Graph().as_default():
        mfccmap = v1.placeholder(tf.float32, (None, 36, 48, 12))
        feat = v1.placeholder(tf.float32, (None, 12, 16, 12))
        out = _build_tf_unet_acres(mfccmap, feat)
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out, {mfccmap: mfccmap_np, feat: feat_np})
            v1.train.Saver().save(sess, ckpt_path)

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, _ = import_scope(ckpt, "UNetAcRes")

    model = UNetAcResNet(skips=1)
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)},
        mfccmap_np[:1], feat_np[:1],
    )
    merged = merge_into(variables["params"], params, strict=True)
    got = model.apply({"params": merged}, mfccmap_np, feat_np, sample=False)

    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


def _base_conv3d(x, cout, name):
    """base.build3DConvolution: 12x1x1 temporal conv, trunc-normal(0.01)."""
    with v1.variable_scope(name):
        w = v1.get_variable(
            "weights", [12, 1, 1, int(x.shape[-1]), cout],
            initializer=v1.truncated_normal_initializer(0.0, 0.01),
        )
        b = v1.get_variable("biases", [cout], initializer=tf.zeros_initializer())
        return tf.nn.conv3d(x, w, strides=[1] * 5, padding="SAME") + b


def _base_conv2d(x, cout, k, name):
    with v1.variable_scope(name):
        w = v1.get_variable(
            "weights", [k, k, int(x.shape[-1]), cout],
            initializer=v1.truncated_normal_initializer(0.0, 0.01),
        )
        b = v1.get_variable("biases", [cout], initializer=tf.zeros_initializer())
        return tf.nn.conv2d(x, w, strides=[1, 1, 1, 1], padding="SAME") + b


def _base_fc(x, cout, name):
    with v1.variable_scope(name):
        w = v1.get_variable(
            "weights", [int(x.shape[-1]), cout],
            initializer=v1.truncated_normal_initializer(0.0, 0.01),
        )
        b = v1.get_variable("biases", [cout], initializer=tf.zeros_initializer())
        return tf.matmul(x, w) + b


@pytest.mark.slow
def _build_tf_dualcamnet(x, num_classes=10):
    """DualCamNet reference graph (dualcamnet.py:75-121): temporal conv3d,
    5x5 convs, VALID 3/3 max-pool, spatial sum-pool, FCs."""
    with v1.variable_scope("DualCamNet"):
        net = tf.reshape(x, (-1, 12, 36, 48, 12))
        net = tf.nn.relu(_base_conv3d(net, 12, "conv1"))
        net = tf.reshape(net, (-1, 36, 48, 12))
        net = tf.nn.relu(_base_conv2d(net, 32, 5, "conv2"))
        net = tf.nn.max_pool2d(net, 3, 3, "VALID")
        net = tf.nn.relu(_base_conv2d(net, 128, 5, "conv3"))
        net = tf.reduce_sum(net, axis=[1, 2])
        net = tf.nn.relu(_base_fc(net, 1000, "full1"))
        return _base_fc(net, num_classes, "full3")


def test_dualcamnet_matches_tf_checkpoint(tmp_path):
    """DualCamNet forward parity (dualcamnet.py:75-121 semantics: temporal
    conv3d, 5x5 convs, VALID 3/3 max-pool, spatial sum-pool, FCs)."""
    rng = np.random.default_rng(1)
    x_np = rng.random((24, 36, 48, 12)).astype(np.float32)  # 2 clips x 12 frames

    ckpt_path = str(tmp_path / "dualcamnet.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 36, 48, 12))
        logits = _build_tf_dualcamnet(x)
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_logits = sess.run(logits, {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import DualCamNet

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, _ = import_scope(ckpt, "DualCamNet")
    model = DualCamNet(num_classes=10)
    variables = model.init({"params": jax.random.key(0)}, x_np)
    merged = merge_into(variables["params"], params, strict=True)
    got = np.asarray(model.apply({"params": merged}, x_np))
    np.testing.assert_allclose(got, tf_logits, rtol=2e-4, atol=2e-3)


def _bn_eval(x, name):
    """tf.layers.batch_normalization(training=False) with fresh stats:
    gamma/beta/moving stats at default init, eps 1e-3 (the tf.layers
    default our flax BatchNorm mirrors)."""
    with v1.variable_scope(name):
        c = int(x.shape[-1])
        gamma = v1.get_variable("gamma", [c], initializer=tf.ones_initializer())
        beta = v1.get_variable("beta", [c], initializer=tf.zeros_initializer())
        mean = v1.get_variable("moving_mean", [c], initializer=tf.zeros_initializer(),
                               trainable=False)
        var = v1.get_variable("moving_variance", [c], initializer=tf.ones_initializer(),
                              trainable=False)
        return tf.nn.batch_normalization(x, mean, var, beta, gamma, 1e-3)


def _ccp_bn(net, filters, name, pool=False, pool_k=(3, 3), pool_pad="SAME"):
    """unet_sound.py conv_conv_pool with BN, eval mode."""
    with v1.variable_scope(f"layer{name}"):
        for i in range(2):
            net = _conv2d(net, filters, (3, 3), f"conv_{i + 1}")
            net = _bn_eval(net, f"bn_{i + 1}")
            net = tf.nn.relu(net)
        if not pool:
            return net
        p = _conv2d(net, filters, pool_k, "pool_2", strides=(2, 2), padding=pool_pad)
        p = _bn_eval(p, "bn_pool_2")
        return net, tf.nn.relu(p)


def _deconv_rect(x, filters, kh, kw, strides, name):
    with v1.variable_scope(name):
        k = v1.get_variable(
            "kernel", [kh, kw, filters, int(x.shape[-1])],
            initializer=v1.glorot_uniform_initializer(),
        )
        b = v1.get_variable("bias", [filters], initializer=tf.zeros_initializer())
        out_h = int(x.shape[1]) * strides + max(kh - strides, 0)
        out_w = int(x.shape[2]) * strides + max(kw - strides, 0)
        y = tf.nn.conv2d_transpose(
            x, k, output_shape=[tf.shape(x)[0], out_h, out_w, filters],
            strides=[1, strides, strides, 1], padding="VALID",
        )
        return y + b


@pytest.mark.slow
def test_unet_sound_small_matches_tf_checkpoint(tmp_path):
    """Audio VAE (unet_sound.py wiring) forward parity in eval mode with
    z = mean: VALID pool convs, BN(eps 1e-3), skip concats, rectangular
    deconv kernels."""
    rng = np.random.default_rng(2)
    x_np = rng.random((2, 99, 257, 1)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetsound.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 99, 257, 1))
        with v1.variable_scope("UNetAudio"):
            conv1, p1 = _ccp_bn(x, 8, "1", pool=True, pool_pad="VALID")
            conv2, p2 = _ccp_bn(p1, 8, "2", pool=True, pool_k=(3, 2), pool_pad="VALID")
            conv3, p3 = _ccp_bn(p2, 32, "3", pool=True)
            conv4, p4 = _ccp_bn(p3, 64, "4", pool=True)
            conv5 = _ccp_bn(p4, 128, "5")
            mean = tf.reshape(_conv2d(conv5, 128, (6, 16), "mean", padding="VALID"), (-1, 128))
            _ = _conv2d(conv5, 128, (6, 16), "variance", padding="VALID")
            net = tf.nn.relu(_dense(mean, 6 * 16))
            net = tf.reshape(net, (-1, 6, 16, 1))
            net = tf.nn.relu(_conv2d(net, 128, (3, 3), "conv2d"))
            up = _deconv_rect(net, 64, 2, 2, 2, "upsample_6")
            up = _ccp_bn(tf.concat([up, conv4], -1), 64, "6")
            up = _deconv_rect(up, 32, 2, 2, 2, "upsample_7")
            up = _ccp_bn(tf.concat([up, conv3], -1), 32, "7")
            up = _deconv_rect(up, 8, 3, 2, 2, "upsample_8")
            up = _ccp_bn(tf.concat([up, conv2], -1), 8, "8")
            up = _deconv_rect(up, 8, 3, 3, 2, "upsample_9")
            up = _ccp_bn(tf.concat([up, conv1], -1), 8, "9")
            out = tf.sigmoid(_conv2d(up, 1, (1, 1), "final"))
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out, {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import UNetSound

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "UNetAudio")
    model = UNetSound(variant="small")
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x_np, train=False
    )
    merged_p = merge_into(variables["params"], params, strict=True)
    merged_s = merge_into(variables["batch_stats"], stats, strict=True)
    got = model.apply(
        {"params": merged_p, "batch_stats": merged_s}, x_np, sample=False, train=False
    )
    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def _build_tf_unet_acoustic(x):
    """Skip-less acoustic VAE reference graph (unet_noconc.py wiring)."""
    with v1.variable_scope("UNetAcoustic"):
        conv1, pool1 = _conv_conv_pool(x, 128, "1", pool=True)
        conv2 = _conv_conv_pool(pool1, 133, "3")
        mean = tf.reshape(_conv2d(conv2, 150, (12, 16), "mean", padding="VALID"), (-1, 150))
        _ = _conv2d(conv2, 150, (12, 16), "std", padding="VALID")
        net = tf.nn.relu(_dense(mean, 12 * 16 * 12))
        net = tf.reshape(net, (-1, 12, 16, 12))
        net = tf.nn.relu(_conv2d(net, 133, (3, 3), "conv2d"))
        up1 = _deconv(net, 128, 2, 3, "upsample_1")
        conv4 = _conv_conv_pool(up1, 128, "4")
        conv5 = _conv_conv_pool(conv4, 128, "5")
        out = tf.sigmoid(_conv2d(conv5, 12, (3, 3), "final"))
    return out, mean


def test_unet_acoustic_matches_tf_checkpoint(tmp_path):
    """Skip-less acoustic VAE (unet_noconc.py wiring) parity with z = mean."""
    rng = np.random.default_rng(3)
    x_np = rng.random((2, 36, 48, 12)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetac.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 36, 48, 12))
        out, _ = _build_tf_unet_acoustic(x)
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out, {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import UNetAcoustic

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, _ = import_scope(ckpt, "UNetAcoustic")
    model = UNetAcoustic()
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x_np
    )
    merged = merge_into(variables["params"], params, strict=True)
    got = model.apply({"params": merged}, x_np, sample=False)
    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


def _slim_conv_bn(x, cout, ksize, stride, name, relu=True, fixed_pad=False,
                  padding="SAME"):
    """slim conv2d under resnet_arg_scope, eval mode: conv (no bias) ->
    BN(eps 1e-5, scale) [-> relu]. fixed_pad = resnet_utils.conv2d_same."""
    with v1.variable_scope(name):
        k = v1.get_variable(
            "weights", [*ksize, int(x.shape[-1]), cout],
            initializer=v1.glorot_uniform_initializer(),
        )
        if fixed_pad and stride > 1:
            kh = ksize[0]
            pad_beg = (kh - 1) // 2
            pad_end = kh - 1 - pad_beg
            x = tf.pad(x, [[0, 0], [pad_beg, pad_end], [pad_beg, pad_end], [0, 0]])
            y = tf.nn.conv2d(x, k, strides=[1, stride, stride, 1], padding="VALID")
        else:
            y = tf.nn.conv2d(x, k, strides=[1, stride, stride, 1], padding=padding)
        with v1.variable_scope("BatchNorm"):
            c = cout
            gamma = v1.get_variable("gamma", [c], initializer=tf.ones_initializer())
            beta = v1.get_variable("beta", [c], initializer=tf.zeros_initializer())
            mean = v1.get_variable("moving_mean", [c],
                                   initializer=tf.zeros_initializer(), trainable=False)
            var = v1.get_variable("moving_variance", [c],
                                  initializer=tf.ones_initializer(), trainable=False)
            y = tf.nn.batch_normalization(y, mean, var, beta, gamma, 1e-5)
        return tf.nn.relu(y) if relu else y


def _bottleneck(x, depth, depth_bottleneck, stride, name):
    with v1.variable_scope(name), v1.variable_scope("bottleneck_v1"):
        depth_in = int(x.shape[-1])
        if depth == depth_in:
            shortcut = x if stride == 1 else tf.nn.max_pool2d(x, 1, stride, "VALID")
        else:
            shortcut = _slim_conv_bn(x, depth, (1, 1), stride, "shortcut", relu=False)
        r = _slim_conv_bn(x, depth_bottleneck, (1, 1), 1, "conv1")
        r = _slim_conv_bn(r, depth_bottleneck, (3, 3), stride, "conv2",
                          fixed_pad=stride > 1)
        r = _slim_conv_bn(r, depth, (1, 1), 1, "conv3", relu=False)
        return tf.nn.relu(shortcut + r)


@pytest.mark.slow
def test_resnet50_trunk_matches_tf_checkpoint(tmp_path):
    """Reduced-depth (1 unit/block) stride-16 ResNet50 + conv_map parity in
    eval mode — validates bottleneck wiring, fixed-pad stride-2 convs, slim
    BN semantics, and the 12x16x12 conv_map head."""
    rng = np.random.default_rng(4)
    x_np = rng.random((1, 224, 298, 3)).astype(np.float32)

    blocks = [("block1", 64, 1), ("block2", 128, 2), ("block3", 256, 2), ("block4", 512, 1)]
    ckpt_path = str(tmp_path / "resnet.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 224, 298, 3))
        with v1.variable_scope("resnet_v1_50"):
            net = _slim_conv_bn(x, 64, (7, 7), 2, "conv1", fixed_pad=True)
            net = tf.nn.max_pool2d(net, 3, 2, "VALID")
            for bname, base, stride in blocks:
                with v1.variable_scope(bname):
                    net = _bottleneck(net, base * 4, base, stride, "unit_1")
            net = _slim_conv_bn(net, 12, (3, 4), 1, "conv_map", padding="VALID")
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(net, {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import ResNet50

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "resnet_v1_50")
    model = ResNet50(blocks=((64, 1, 1), (128, 1, 2), (256, 1, 2), (512, 1, 1)))
    variables = model.init({"params": jax.random.key(0)}, x_np, train=False)
    merged_p = merge_into(variables["params"], params, strict=True)
    merged_s = merge_into(variables["batch_stats"], stats, strict=True)
    got = model.apply({"params": merged_p, "batch_stats": merged_s}, x_np, train=False)
    assert got.shape == tf_out.shape == (1, 12, 16, 12)
    np.testing.assert_allclose(np.asarray(got), tf_out, rtol=5e-4, atol=5e-4)


def _deconv_rect2(x, filters, kh, kw, sh, sw, name):
    with v1.variable_scope(name):
        k = v1.get_variable(
            "kernel", [kh, kw, filters, int(x.shape[-1])],
            initializer=v1.glorot_uniform_initializer(),
        )
        b = v1.get_variable("bias", [filters], initializer=tf.zeros_initializer())
        out_h = int(x.shape[1]) * sh + max(kh - sh, 0)
        out_w = int(x.shape[2]) * sw + max(kw - sw, 0)
        y = tf.nn.conv2d_transpose(
            x, k, output_shape=[tf.shape(x)[0], out_h, out_w, filters],
            strides=[1, sh, sw, 1], padding="VALID",
        )
        return y + b


def _ccp_bn_opts(net, filters, name, pool=False, pool_k=(3, 3), pool_s=(2, 2),
                 pool_pad="SAME"):
    with v1.variable_scope(f"layer{name}"):
        for i in range(2):
            net = _conv2d(net, filters, (3, 3), f"conv_{i + 1}")
            net = _bn_eval(net, f"bn_{i + 1}")
            net = tf.nn.relu(net)
        if not pool:
            return net
        p = _conv2d(net, filters, pool_k, "pool_2", strides=pool_s, padding=pool_pad)
        p = _bn_eval(p, "bn_pool_2")
        return net, tf.nn.relu(p)


@pytest.mark.slow
def _build_tf_unet_video(x):
    """Video VAE reference graph (unet_architecture_noconc.py wiring)."""
    with v1.variable_scope("UNet"):
        _, p1 = _ccp_bn_opts(x, 32, "1", pool=True, pool_s=(3, 3), pool_pad="VALID")
        _, p2 = _ccp_bn_opts(p1, 128, "2", pool=True, pool_pad="VALID")
        _, p3 = _ccp_bn_opts(p2, 256, "3", pool=True, pool_k=(2, 3),
                             pool_s=(3, 3), pool_pad="VALID")
        conv5 = _ccp_bn_opts(p3, 512, "5")
        mean = tf.reshape(_conv2d(conv5, 1024, (12, 16), "mean", padding="VALID"), (-1, 1024))
        _ = _conv2d(conv5, 1024, (12, 16), "std", padding="VALID")
        net = tf.nn.relu(_dense(mean, 12 * 16 * 50))
        net = tf.reshape(net, (-1, 12, 16, 50))
        net = tf.nn.relu(_conv2d(net, 512, (3, 3), "conv2d"))
        up = _deconv_rect2(net, 256, 3, 4, 3, 3, "upsample_6")
        up = _ccp_bn_opts(up, 256, "6")
        up = _ccp_bn_opts(up, 256, "7")
        up = _deconv_rect2(up, 128, 4, 3, 2, 2, "upsample_8")
        up = _ccp_bn_opts(up, 128, "8")
        up = _ccp_bn_opts(up, 128, "9")
        up = _deconv_rect2(up, 32, 5, 4, 3, 3, "upsample_10")
        up = _ccp_bn_opts(up, 32, "10")
        up = _ccp_bn_opts(up, 32, "11")
        out = tf.sigmoid(_conv2d(up, 3, (1, 1), "final"))
    return out


def test_unet_video_matches_tf_checkpoint(tmp_path):
    """Video VAE (unet_architecture_noconc.py wiring) parity with z = mean:
    VALID pool convs with mixed kernels/strides and rectangular stride-3
    deconvs (3,4)/(4,3)/(5,4)."""
    rng = np.random.default_rng(5)
    x_np = rng.random((1, 224, 298, 3)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetvideo.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 224, 298, 3))
        out = _build_tf_unet_video(x)
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out, {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import UNetVideo

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "UNet")
    model = UNetVideo()
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x_np, train=False
    )
    merged_p = merge_into(variables["params"], params, strict=True)
    merged_s = merge_into(variables["batch_stats"], stats, strict=True)
    got = model.apply(
        {"params": merged_p, "batch_stats": merged_s}, x_np, sample=False, train=False
    )
    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_latent_associator_matches_tf_checkpoint(tmp_path):
    """AssociatorVideoAc MLP parity (multimodal.py:21-48): per-branch dense
    stacks, softplus std head."""
    rng = np.random.default_rng(6)
    mean_np = rng.normal(size=(4, 1024)).astype(np.float32)
    std_np = rng.random((4, 1024)).astype(np.float32)

    hidden = [512, 512, 256, 256, 150]
    ckpt_path = str(tmp_path / "assoc.ckpt")
    with tf.Graph().as_default():
        mean_in = v1.placeholder(tf.float32, (None, 1024))
        std_in = v1.placeholder(tf.float32, (None, 1024))
        with v1.variable_scope("AssociatorVideoAc"):
            net = mean_in
            for i, h in enumerate(hidden):
                net = tf.nn.relu(_dense(net, h, f"mean_{i}"))
            mean_out = _dense(net, 150, "mean_out")
            net2 = std_in
            for i, h in enumerate(hidden):
                net2 = tf.nn.relu(_dense(net2, h, f"std_{i}"))
            std_out = tf.nn.softplus(_dense(net2, 150, "std_out"))
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_mean, tf_std = sess.run(
                [mean_out, std_out], {mean_in: mean_np, std_in: std_np}
            )
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models.associators import (
        VIDEO_AC_HIDDEN,
        LatentAssociator,
    )

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, _ = import_scope(ckpt, "AssociatorVideoAc")
    model = LatentAssociator(VIDEO_AC_HIDDEN)
    variables = model.init({"params": jax.random.key(0)}, mean_np, std_np)
    merged = merge_into(variables["params"], params, strict=True)
    got_mean, got_std = model.apply({"params": merged}, mean_np, std_np)
    np.testing.assert_allclose(np.asarray(got_mean), tf_mean, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_std), tf_std, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_jointmvae_matches_tf_checkpoint(tmp_path):
    """Jointmvae feature fuser parity (multimodal.py:287-320): per-position
    dense trunk + relu heads."""
    rng = np.random.default_rng(7)
    f_ac = rng.normal(size=(2, 12, 16, 133)).astype(np.float32)
    f_vi = rng.normal(size=(2, 12, 16, 512)).astype(np.float32)
    f_au = rng.normal(size=(2, 12, 16, 128)).astype(np.float32)

    ckpt_path = str(tmp_path / "jointmvae.ckpt")
    with tf.Graph().as_default():
        pa = v1.placeholder(tf.float32, (None, 12, 16, 133))
        pv = v1.placeholder(tf.float32, (None, 12, 16, 512))
        pu = v1.placeholder(tf.float32, (None, 12, 16, 128))
        with v1.variable_scope("Jointmvae"):
            net = tf.concat([pa, pv, pu], axis=-1)
            for i in range(3):
                net = tf.nn.relu(_dense4(net, 512, f"dense_{i}"))
            out_ac = tf.nn.relu(_dense4(net, 133, "out_ac"))
            out_vi = tf.nn.relu(_dense4(net, 512, "out_video"))
            out_au = tf.nn.relu(_dense4(net, 128, "out_audio"))
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_ac, tf_vi, tf_au = sess.run(
                [out_ac, out_vi, out_au], {pa: f_ac, pv: f_vi, pu: f_au}
            )
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models.associators import JointMVAE

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, _ = import_scope(ckpt, "Jointmvae")
    model = JointMVAE(heads=("ac", "video", "audio"))
    variables = model.init({"params": jax.random.key(0)}, f_ac, f_vi, f_au)
    merged = merge_into(variables["params"], params, strict=True)
    got = model.apply({"params": merged}, f_ac, f_vi, f_au)
    np.testing.assert_allclose(np.asarray(got["ac"]), tf_ac, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["video"]), tf_vi, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["audio"]), tf_au, rtol=2e-4, atol=2e-4)


def _dense4(x, units, name):
    """tf.layers.dense applied to a 4-D tensor (matmul on the last axis)."""
    with v1.variable_scope(name):
        k = v1.get_variable(
            "kernel", [int(x.shape[-1]), units],
            initializer=v1.glorot_uniform_initializer(),
        )
        b = v1.get_variable("bias", [units], initializer=tf.zeros_initializer())
        return tf.tensordot(x, k, axes=[[3], [0]]) + b


def _ccp_nobn(net, filters, name, pool=False, pool_k=(3, 3), pool_pad="SAME"):
    """unet_architecture_energy.py conv_conv_pool: convs 3x3 SAME + ReLU
    (BN commented out upstream), pool = stride-2 conv + ReLU."""
    with v1.variable_scope(f"layer{name}"):
        for i in range(2):
            net = tf.nn.relu(_conv2d(net, filters, (3, 3), f"conv_{i + 1}"))
        if not pool:
            return net
        p = _conv2d(net, filters, pool_k, "pool_2", strides=(2, 2), padding=pool_pad)
        return net, tf.nn.relu(p)


@pytest.mark.slow
def test_unet_energy_matches_tf_checkpoint(tmp_path):
    """Energy-map UNet (unet_architecture_energy.py:49-95): BN-less conv
    pairs, (3,5)-VALID pool to the 4x4x8 bottleneck whose flattening IS the
    latent (mean == variance == reshape), rectangular (3,6) deconv, three
    skip concats, ReLU final."""
    rng = np.random.default_rng(7)
    x_np = rng.random((2, 36, 48, 1)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetenergy.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 36, 48, 1))
        with v1.variable_scope("UNetEnergy"):
            conv1, pool1 = _ccp_nobn(x, 16, "1", pool=True)          # 18x24
            conv2, pool2 = _ccp_nobn(pool1, 16, "2", pool=True)      # 9x12
            conv3, pool3 = _ccp_nobn(
                pool2, 8, "3", pool=True, pool_k=(3, 5), pool_pad="VALID"
            )                                                        # 4x4
            conv4 = _ccp_nobn(pool3, 8, "4")
            mean = tf.reshape(conv4, (-1, 128))                      # z = mean
            net = tf.reshape(mean, (-1, 4, 4, 8))
            up6 = _deconv_rect(net, 8, 3, 6, 2, "upsample_6")        # 9x12
            net = _ccp_nobn(tf.concat([up6, conv3], -1), 8, "6")
            net = _ccp_nobn(net, 8, "6_2")
            up7 = _deconv_rect(net, 16, 2, 2, 2, "upsample_7")       # 18x24
            net = _ccp_nobn(tf.concat([up7, conv2], -1), 16, "7")
            net = _ccp_nobn(net, 16, "7_2")
            up8 = _deconv_rect(net, 16, 2, 2, 2, "upsample_8")       # 36x48
            net = _ccp_nobn(tf.concat([up8, conv1], -1), 16, "8")
            net = _ccp_nobn(net, 8, "8_2")
            out = tf.nn.relu(_conv2d(net, 1, (3, 3), "final"))
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out, tf_mean = sess.run([out, mean], {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import UNetEnergy

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "UNetEnergy")
    assert not stats, "energy UNet has no batch norm"
    model = UNetEnergy()
    variables = model.init({"params": jax.random.key(0)}, x_np)
    merged = merge_into(variables["params"], params, strict=True)
    got = model.apply({"params": merged}, x_np, sample=False)
    np.testing.assert_allclose(np.asarray(got.mean), tf_mean, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_unet_z_external_latent_matches_tf_checkpoint(tmp_path):
    """unet_z.py (UNetzvariable): same weight structure as the acoustic
    VAE, but the decoder consumes another modality's (mean2, std2)
    (``unet_z.py:63``, z = mean2 with the noise zeroed for parity)."""
    rng = np.random.default_rng(11)
    x_np = rng.random((2, 36, 48, 12)).astype(np.float32)
    mean2_np = rng.standard_normal((2, 150)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetz.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 36, 48, 12))
        mean2 = v1.placeholder(tf.float32, (None, 150))
        with v1.variable_scope("UNetAcoustic"):
            conv1, pool1 = _conv_conv_pool(x, 128, "1", pool=True)
            conv2 = _conv_conv_pool(pool1, 133, "3")
            enc_mean = tf.reshape(
                _conv2d(conv2, 150, (12, 16), "mean", padding="VALID"), (-1, 150)
            )
            _ = _conv2d(conv2, 150, (12, 16), "std", padding="VALID")
            net = tf.nn.relu(_dense(mean2, 12 * 16 * 12))  # decode external z
            net = tf.reshape(net, (-1, 12, 16, 12))
            net = tf.nn.relu(_conv2d(net, 133, (3, 3), "conv2d"))
            up1 = _deconv(net, 128, 2, 3, "upsample_1")
            conv4 = _conv_conv_pool(up1, 128, "4")
            conv5 = _conv_conv_pool(conv4, 128, "5")
            out = tf.sigmoid(_conv2d(conv5, 12, (3, 3), "final"))
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out, tf_enc_mean = sess.run(
                [out, enc_mean], {x: x_np, mean2: mean2_np}
            )
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import UNetAcoustic

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, _ = import_scope(ckpt, "UNetAcoustic")
    model = UNetAcoustic()
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x_np
    )
    merged = merge_into(variables["params"], params, strict=True)
    std2 = np.ones_like(mean2_np)
    got = model.apply(
        {"params": merged}, x_np, external_latent=(mean2_np, std2), sample=False
    )
    # encoder still runs (its mean/std feed the associator losses)
    np.testing.assert_allclose(np.asarray(got.mean), tf_enc_mean, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_associator_audio_encoder_matches_tf_checkpoint(tmp_path):
    """AssociatorAudio (multimodal.py:139-204): BN conv encoder from the
    193x257 spectrogram straight to a (mean, softplus std) acoustic latent;
    layer1's pool conv is VALID."""
    rng = np.random.default_rng(13)
    x_np = rng.random((2, 193, 257, 1)).astype(np.float32)

    ckpt_path = str(tmp_path / "assoc_audio.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 193, 257, 1))
        with v1.variable_scope("AssociatorAudio"):
            _, p1 = _ccp_bn(x, 16, "1", pool=True, pool_pad="VALID")
            _, p2 = _ccp_bn(p1, 16, "2", pool=True)
            _, p3 = _ccp_bn(p2, 64, "3", pool=True)
            _, p4 = _ccp_bn(p3, 128, "4", pool=True)
            conv5 = _ccp_bn(p4, 128, "5")
            mean = tf.reshape(
                _conv2d(conv5, 150, (12, 16), "mean", padding="VALID"), (-1, 150)
            )
            std = tf.nn.softplus(
                tf.reshape(
                    _conv2d(conv5, 150, (12, 16), "std", padding="VALID"), (-1, 150)
                )
            )
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_mean, tf_std = sess.run([mean, std], {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models.associators import AssociatorAudioEncoder

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "AssociatorAudio")
    model = AssociatorAudioEncoder()
    variables = model.init({"params": jax.random.key(0)}, x_np, train=False)
    merged = merge_into(variables["params"], params, strict=True)
    merged_stats = merge_into(variables["batch_stats"], stats, strict=True)
    got_mean, got_std = model.apply(
        {"params": merged, "batch_stats": merged_stats}, x_np, train=False
    )
    np.testing.assert_allclose(np.asarray(got_mean), tf_mean, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_std), tf_std, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def _build_tf_unet_audio(x):
    """unet_sound2.py reference graph (the audio VAE main.py wires)."""
    with v1.variable_scope("UNetAudio"):
        _, p1 = _ccp_bn(x, 16, "1", pool=True, pool_pad="VALID")   # 96x128
        _, p2 = _ccp_bn(p1, 16, "2", pool=True)                    # 48x64
        _, p3 = _ccp_bn(p2, 64, "3", pool=True)                    # 24x32
        _, p4 = _ccp_bn(p3, 128, "4", pool=True)                   # 12x16
        conv5 = _ccp_bn(p4, 128, "5")
        mean = tf.reshape(
            _conv2d(conv5, 256, (12, 16), "mean", padding="VALID"), (-1, 256)
        )
        _ = _conv2d(conv5, 256, (12, 16), "std", padding="VALID")
        net = tf.nn.relu(_dense(mean, 12 * 16 * 10))               # z = mean
        net = tf.reshape(net, (-1, 12, 16, 10))
        net = tf.nn.relu(_conv2d(net, 128, (3, 3), "conv2d"))
        net = _ccp_bn(_deconv_rect(net, 128, 2, 2, 2, "upsample_6"), 128, "6")
        net = _ccp_bn(net, 128, "7")
        net = _ccp_bn(_deconv_rect(net, 64, 2, 2, 2, "upsample_8"), 64, "8")
        net = _ccp_bn(net, 64, "9")
        net = _ccp_bn(_deconv_rect(net, 16, 2, 2, 2, "upsample_10"), 16, "10")
        net = _ccp_bn(net, 16, "11")
        net = _ccp_bn(_deconv_rect(net, 16, 3, 3, 2, "upsample_12"), 16, "12")
        net = _ccp_bn(net, 16, "13")
        out = tf.sigmoid(_conv2d(net, 1, (1, 1), "final"))
    return out, mean


def test_unet_sound_large_matches_tf_checkpoint(tmp_path):
    """unet_sound2.py (the audio VAE main.py actually wires): 193x257
    spectrogram, BN conv pairs, VALID layer1 pool, 256-d softplus-std VAE,
    4 skip-less up stages ending in a (3,3)-VALID-rule deconv to 193x257."""
    rng = np.random.default_rng(17)
    x_np = rng.random((2, 193, 257, 1)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetsound2.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 193, 257, 1))
        out, mean = _build_tf_unet_audio(x)
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out, tf_mean = sess.run([out, mean], {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import UNetSound

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "UNetAudio")
    model = UNetSound(variant="large")
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x_np, train=False
    )
    merged = merge_into(variables["params"], params, strict=True)
    merged_stats = merge_into(variables["batch_stats"], stats, strict=True)
    got = model.apply(
        {"params": merged, "batch_stats": merged_stats}, x_np,
        sample=False, train=False,
    )
    assert got.output.shape == (2, 193, 257, 1)
    np.testing.assert_allclose(np.asarray(got.mean), tf_mean, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


def _slim_conv_relu(x, ch, name):
    with v1.variable_scope(name):
        w = v1.get_variable(
            "weights", [3, 3, int(x.shape[-1]), ch],
            initializer=v1.truncated_normal_initializer(stddev=0.01),
        )
        b = v1.get_variable("biases", [ch], initializer=tf.zeros_initializer())
        return tf.nn.relu(tf.nn.conv2d(x, w, [1, 1, 1, 1], "SAME") + b)


def _slim_fc_relu(x, units, name):
    with v1.variable_scope(name):
        w = v1.get_variable(
            "weights", [int(x.shape[-1]), units],
            initializer=v1.truncated_normal_initializer(stddev=0.01),
        )
        b = v1.get_variable("biases", [units], initializer=tf.zeros_initializer())
        return tf.nn.relu(tf.matmul(x, w) + b)


@pytest.mark.slow
def test_vggish_matches_tf_checkpoint(tmp_path):
    """VGGish (vggish.py:35-77): slim conv/pool VGG stack + 2x FC4096 under
    the lowercase 'vggish' scope, with slim.repeat's nested unit scopes
    (conv3/conv3_1, fc1/fc1_2) collapsed by the importer — the layout of a
    real AudioSet vggish_model.ckpt."""
    rng = np.random.default_rng(23)
    x_np = rng.random((2, 96, 64, 1)).astype(np.float32)

    ckpt_path = str(tmp_path / "vggish.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 96, 64, 1))
        with v1.variable_scope("vggish"):
            net = _slim_conv_relu(x, 64, "conv1")
            net = tf.nn.max_pool2d(net, 2, 2, "SAME")
            net = _slim_conv_relu(net, 128, "conv2")
            net = tf.nn.max_pool2d(net, 2, 2, "SAME")
            with v1.variable_scope("conv3"):  # slim.repeat nesting
                net = _slim_conv_relu(net, 256, "conv3_1")
                net = _slim_conv_relu(net, 256, "conv3_2")
            net = tf.nn.max_pool2d(net, 2, 2, "SAME")
            with v1.variable_scope("conv4"):
                net = _slim_conv_relu(net, 512, "conv4_1")
                net = _slim_conv_relu(net, 512, "conv4_2")
            net = tf.nn.max_pool2d(net, 2, 2, "SAME")
            net = tf.reshape(net, (-1, 6 * 4 * 512))
            with v1.variable_scope("fc1"):
                net = _slim_fc_relu(net, 4096, "fc1_1")
                net = _slim_fc_relu(net, 4096, "fc1_2")
            out = tf.reshape(net, (-1, 1, 1, 4096))
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out, {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models.vggish import VGGish

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "vggish")
    assert not stats
    model = VGGish()
    variables = model.init({"params": jax.random.key(0)}, x_np)
    merged = merge_into(variables["params"], params, strict=True)
    got = model.apply({"params": merged}, x_np)
    np.testing.assert_allclose(np.asarray(got), tf_out, rtol=2e-4, atol=2e-5)


# ------------------------------------------------------- training parity


def _slim_conv_bn_train(x, cout, ksize, stride, name, relu=True,
                        fixed_pad=False, padding="SAME", wd=5e-4,
                        reg=None, updates=None, decay=0.997):
    """slim conv2d under resnet_arg_scope in TRAIN mode: conv (no bias) ->
    BN on batch moments with moving-average assign ops (UPDATE_OPS
    equivalent) [-> relu]; weight decay appended to ``reg`` exactly like
    the l2_regularizer the arg scope installs (vision.py:54)."""
    with v1.variable_scope(name):
        k = v1.get_variable(
            "weights", [*ksize, int(x.shape[-1]), cout],
            initializer=v1.glorot_uniform_initializer(),
        )
        if reg is not None and wd:
            reg.append(wd * tf.nn.l2_loss(k))
        if fixed_pad and stride > 1:
            kh = ksize[0]
            pad_beg = (kh - 1) // 2
            pad_end = kh - 1 - pad_beg
            x = tf.pad(x, [[0, 0], [pad_beg, pad_end], [pad_beg, pad_end], [0, 0]])
            y = tf.nn.conv2d(x, k, strides=[1, stride, stride, 1], padding="VALID")
        else:
            y = tf.nn.conv2d(x, k, strides=[1, stride, stride, 1], padding=padding)
        with v1.variable_scope("BatchNorm"):
            c = cout
            gamma = v1.get_variable("gamma", [c], initializer=tf.ones_initializer())
            beta = v1.get_variable("beta", [c], initializer=tf.zeros_initializer())
            mmean = v1.get_variable("moving_mean", [c],
                                    initializer=tf.zeros_initializer(), trainable=False)
            mvar = v1.get_variable("moving_variance", [c],
                                   initializer=tf.ones_initializer(), trainable=False)
            bmean, bvar = tf.nn.moments(y, [0, 1, 2])
            y = tf.nn.batch_normalization(y, bmean, bvar, beta, gamma, 1e-5)
            if updates is not None:
                updates.append(v1.assign(mmean, mmean * decay + bmean * (1 - decay)))
                updates.append(v1.assign(mvar, mvar * decay + bvar * (1 - decay)))
        return tf.nn.relu(y) if relu else y


def _bottleneck_train(x, depth, depth_bottleneck, stride, name, reg, updates):
    with v1.variable_scope(name), v1.variable_scope("bottleneck_v1"):
        depth_in = int(x.shape[-1])
        if depth == depth_in:
            shortcut = x if stride == 1 else tf.nn.max_pool2d(x, 1, stride, "VALID")
        else:
            shortcut = _slim_conv_bn_train(x, depth, (1, 1), stride, "shortcut",
                                           relu=False, reg=reg, updates=updates)
        r = _slim_conv_bn_train(x, depth_bottleneck, (1, 1), 1, "conv1",
                                reg=reg, updates=updates)
        r = _slim_conv_bn_train(r, depth_bottleneck, (3, 3), stride, "conv2",
                                fixed_pad=stride > 1, reg=reg, updates=updates)
        r = _slim_conv_bn_train(r, depth, (1, 1), 1, "conv3", relu=False,
                                reg=reg, updates=updates)
        return tf.nn.relu(shortcut + r)


def _build_tf_unet_acres_vae(mfccmap, feat):
    """UNetAcRes with the VAE heads live (mean + softplus std), z = mean
    (deterministic latent for trajectory comparison — both sides use the
    mean path so no RNG needs to be synchronized)."""
    with v1.variable_scope("UNetAcRes"):
        conv1, pool1 = _conv_conv_pool(mfccmap, 128, "1", pool=True)
        conv2_0 = _conv_conv_pool(pool1, 133, "2")
        conv2 = tf.concat([_minmax(conv2_0), _minmax(feat)], axis=-1)
        mean = tf.reshape(_conv2d(conv2, 150, (12, 16), "mean", padding="VALID"), (-1, 150))
        std = tf.nn.softplus(
            tf.reshape(_conv2d(conv2, 150, (12, 16), "std", padding="VALID"), (-1, 150))
        )
        net = tf.nn.relu(_dense(mean, 12 * 16 * 12))
        net = tf.reshape(net, (-1, 12, 16, 12))
        net = tf.nn.relu(_conv2d(net, 133, (3, 3), "conv2d"))
        conv4 = _conv_conv_pool(net, 128, "4")
        conv5 = _conv_conv_pool(conv4, 128, "5")
        up1 = _deconv(conv5, 128, 2, 3, "upsample_1")
        up1 = tf.concat([up1, conv1], axis=-1)
        conv6 = _conv_conv_pool(up1, 128, "6")
        conv7 = _conv_conv_pool(conv6, 64, "7")
        out = tf.sigmoid(_conv2d(conv7, 12, (3, 3), "final"))
    return out, mean, std


@pytest.mark.slow
def test_flagship_training_trajectory_matches_tf(tmp_path):
    """Multi-step TRAINING parity (VERDICT round-1 item 3): same init (via
    a real TF checkpoint), same batches -> the TF1 graph (train-mode BN
    with UPDATE_OPS, tf.losses MSE+Huber, latent-weighted KL, slim L2
    weight decay, tf.train.AdamOptimizer over the reference var_list) and
    this framework's GenerationTask semantics must produce matching loss
    trajectories and matching trained conv_map weights over 6 steps.

    Reference semantics: /root/reference/trainer/mfcctrainer.py:46-79
    (losses + Adam + UPDATE_OPS), models/vision.py:68-71 (var_list).
    Deterministic latent (z = mean) on both sides; reduced-depth trunk
    (1 unit/block) with identical structure."""
    import optax

    from acoustic_image_generation_tpu.losses import (
        huber_tf, kl_diag_gaussian, l2_regularization, mse_tf,
    )
    from acoustic_image_generation_tpu.models import ResNet50, UNetAcResNet
    from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap
    from acoustic_image_generation_tpu.train.generation import GenerationTask

    rng = np.random.default_rng(11)
    n = 2
    video_np = rng.random((n, 224, 298, 3)).astype(np.float32)
    mfcc_np = rng.random((n, 12)).astype(np.float32)
    acoustic_np = rng.random((n, 36, 48, 12)).astype(np.float32)
    mfccmap_np = np.broadcast_to(mfcc_np[:, None, None, :], (n, 36, 48, 12)).copy()
    latent_w = 1e-6
    lr = 1e-4
    n_steps = 6

    blocks = [("block1", 64, 1), ("block2", 128, 2), ("block3", 256, 2), ("block4", 512, 1)]
    ckpt_path = str(tmp_path / "train_parity.ckpt")
    tf_losses = []
    with tf.Graph().as_default():
        tf.random.set_seed(0)
        video = v1.placeholder(tf.float32, (None, 224, 298, 3))
        mfccmap = v1.placeholder(tf.float32, (None, 36, 48, 12))
        target = v1.placeholder(tf.float32, (None, 36, 48, 12))
        reg, updates = [], []
        with v1.variable_scope("resnet_v1_50"):
            net = _slim_conv_bn_train(video, 64, (7, 7), 2, "conv1", fixed_pad=True,
                                      reg=reg, updates=updates)
            net = tf.nn.max_pool2d(net, 3, 2, "VALID")
            for bname, base, stride in blocks:
                with v1.variable_scope(bname):
                    net = _bottleneck_train(net, base * 4, base, stride, "unit_1",
                                            reg, updates)
            feat = _slim_conv_bn_train(net, 12, (3, 4), 1, "conv_map",
                                       padding="VALID", reg=reg, updates=updates)
        out, mean, std = _build_tf_unet_acres_vae(mfccmap, feat)

        mse = v1.losses.mean_squared_error(target, out)
        hub = v1.losses.huber_loss(target, out)
        kl = latent_w * tf.reduce_mean(
            0.5 * tf.reduce_sum(
                tf.square(mean) + tf.square(std)
                - tf.math.log(1e-8 + tf.square(std)) - 1.0, 1)
        )
        total = mse + hub + kl + tf.add_n(reg)

        # reference var_list (vision.py:70 + mfcctrainer.py:64): generator
        # + conv_map/logits only
        tvars = v1.trainable_variables()
        var_list = [v for v in tvars
                    if v.name.startswith("UNetAcRes/")
                    or "/conv_map/" in v.name]
        opt = v1.train.AdamOptimizer(lr)
        with tf.control_dependencies(updates):
            train_op = opt.minimize(total, var_list=var_list)

        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            v1.train.Saver(v1.global_variables()).save(sess, ckpt_path)
            feed = {video: video_np, mfccmap: mfccmap_np, target: acoustic_np}
            for _ in range(n_steps):
                loss_v, _ = sess.run([total, train_op], feed)
                tf_losses.append(float(loss_v))
            tf_conv_map = sess.run(
                [v for v in tvars if v.name == "resnet_v1_50/conv_map/weights:0"][0]
            )

    # ---------------------------------------------------------------- JAX
    ckpt = load_tf1_checkpoint(ckpt_path)
    r_params, r_stats = import_scope(ckpt, "resnet_v1_50")
    g_params, _ = import_scope(ckpt, "UNetAcRes")

    resnet = ResNet50(blocks=((64, 1, 1), (128, 1, 2), (256, 1, 2), (512, 1, 1)),
                      freeze_trunk=True)
    generator = UNetAcResNet(skips=1)
    rv = resnet.init({"params": jax.random.key(0)}, video_np[:1], train=False)
    gv = generator.init(
        {"params": jax.random.key(1), "latent": jax.random.key(2)},
        mfccmap_np[:1], np.zeros((1, 12, 16, 12), np.float32),
    )
    params = {
        "resnet": merge_into(rv["params"], r_params, strict=True),
        "generator": merge_into(gv["params"], g_params, strict=True),
    }
    batch_stats = merge_into(rv["batch_stats"], r_stats, strict=True)

    from acoustic_image_generation_tpu.train.optim import adam_tf1

    tx = optax.multi_transform(
        {"train": adam_tf1(lr), "frozen": optax.set_to_zero()},
        GenerationTask.param_labels,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            feat, mut = resnet.apply(
                {"params": p["resnet"], "batch_stats": batch_stats},
                video_np, train=True, mutable=["batch_stats"],
            )
            out = generator.apply(
                {"params": p["generator"]}, tile_mfccmap(jnp_mfcc), feat,
                sample=False,
            )
            loss = (
                mse_tf(acoustic_np, out.output)
                + huber_tf(acoustic_np, out.output)
                + latent_w * jnp.mean(kl_diag_gaussian(out.mean, out.std))
                + l2_regularization(p["resnet"], 5e-4)
            )
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates_, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates_), new_stats, new_opt, loss

    import jax.numpy as jnp

    jnp_mfcc = jnp.asarray(mfcc_np)
    jax_losses = []
    for _ in range(n_steps):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        jax_losses.append(float(loss))

    # loss trajectories must track each other step for step
    np.testing.assert_allclose(jax_losses, tf_losses, rtol=5e-4, atol=1e-5)
    # and the actually-trained conv_map weights must land in the same place
    got_conv_map = np.asarray(params["resnet"]["conv_map"]["conv"]["kernel"])
    np.testing.assert_allclose(got_conv_map, tf_conv_map, rtol=1e-3, atol=2e-6)
    assert tf_losses[0] > tf_losses[-1], "training must reduce the loss"


@pytest.mark.slow
def test_unet_video_skip_matches_tf_checkpoint(tmp_path):
    """Legacy skip-connected video VAE (unet_architecture.py:46-95, the
    decodeimages.py model): TF eval-mode forward vs UNetVideoSkip from the
    same checkpoint. z = mean (deterministic); raw-variance head present."""
    rng = np.random.default_rng(21)
    x_np = rng.random((1, 224, 298, 3)).astype(np.float32)

    ckpt_path = str(tmp_path / "unetskip.ckpt")
    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 224, 298, 3))
        with v1.variable_scope("UNet"):
            conv1, pool1 = _ccp_bn_opts(x, 8, "1", pool=True, pool_k=(3, 3))
            conv2, pool2 = _ccp_bn_opts(pool1, 32, "2", pool=True,
                                        pool_k=(2, 3), pool_pad="VALID")
            conv3, pool3 = _ccp_bn_opts(pool2, 32, "3", pool=True, pool_k=(3, 3))
            conv4, pool4 = _ccp_bn_opts(pool3, 64, "4", pool=True,
                                        pool_k=(2, 3), pool_pad="VALID")
            conv5 = _ccp_bn_opts(pool4, 128, "5")
            mean = tf.reshape(
                _conv2d(conv5, 128, (14, 18), "mean", padding="VALID"), (-1, 128))
            _ = _conv2d(conv5, 128, (14, 18), "variance", padding="VALID")
            net = tf.nn.relu(_dense(mean, 14 * 18))
            net = tf.reshape(net, (-1, 14, 18, 1))
            net = tf.nn.relu(_conv2d(net, 128, (3, 3), "conv2d"))
            up6 = _deconv_rect2(net, 64, 2, 3, 2, 2, "upsample_6")
            conv6 = _ccp_bn_opts(tf.concat([up6, conv4], -1), 64, "6")
            up7 = _deconv_rect2(conv6, 32, 2, 2, 2, 2, "upsample_7")
            conv7 = _ccp_bn_opts(tf.concat([up7, conv3], -1), 32, "7")
            up8 = _deconv_rect2(conv7, 32, 2, 3, 2, 2, "upsample_8")
            conv8 = _ccp_bn_opts(tf.concat([up8, conv2], -1), 32, "8")
            up9 = _deconv_rect2(conv8, 8, 2, 2, 2, 2, "upsample_9")
            conv9 = _ccp_bn_opts(tf.concat([up9, conv1], -1), 8, "9")
            out = tf.sigmoid(_conv2d(conv9, 3, (1, 1), "final"))
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out, {x: x_np})
            v1.train.Saver().save(sess, ckpt_path)

    from acoustic_image_generation_tpu.models import UNetVideoSkip

    ckpt = load_tf1_checkpoint(ckpt_path)
    params, stats = import_scope(ckpt, "UNet")
    model = UNetVideoSkip()
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)},
        x_np, train=False,
    )
    merged_p = merge_into(variables["params"], params, strict=True)
    merged_s = merge_into(variables["batch_stats"], stats, strict=True)
    got = model.apply(
        {"params": merged_p, "batch_stats": merged_s}, x_np,
        train=False, sample=False,
    )
    assert got.output.shape == tf_out.shape == (1, 224, 298, 3)
    np.testing.assert_allclose(np.asarray(got.output), tf_out, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_exported_flagship_restores_in_reference_graph(tmp_path):
    """The reverse direction of the parity contract: a model trained HERE
    exports (core/tf1_export) to a checkpoint the reference's OWN graph
    restores via tf.train.Saver — which hard-fails on any missing/renamed/
    mis-shaped variable — and the restored TF forward matches our forward."""
    from acoustic_image_generation_tpu.core.tf1_export import (
        export_scope,
        save_tf1_checkpoint,
    )
    from acoustic_image_generation_tpu.models import UNetAcResNet

    rng = np.random.default_rng(7)
    mfccmap_np = rng.random((2, 36, 48, 12)).astype(np.float32)
    feat_np = rng.random((2, 12, 16, 12)).astype(np.float32)

    model = UNetAcResNet(skips=1)
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)},
        mfccmap_np[:1], feat_np[:1],
    )
    ours = model.apply({"params": variables["params"]}, mfccmap_np, feat_np,
                       sample=False)

    ckpt_path = save_tf1_checkpoint(
        str(tmp_path / "exported_acres.ckpt"),
        export_scope({"params": variables["params"]}, "UNetAcRes"),
    )

    with tf.Graph().as_default():
        mfccmap = v1.placeholder(tf.float32, (None, 36, 48, 12))
        feat = v1.placeholder(tf.float32, (None, 12, 16, 12))
        out = _build_tf_unet_acres(mfccmap, feat)
        with v1.Session() as sess:
            # default var_list = every variable in the reference graph:
            # restore() raises NotFoundError if the export missed one
            v1.train.Saver().restore(sess, ckpt_path)
            tf_out = sess.run(out, {mfccmap: mfccmap_np, feat: feat_np})

    np.testing.assert_allclose(np.asarray(ours.output), tf_out, rtol=2e-4,
                               atol=2e-5)


def _short_train(model, variables, x, rngs, steps=3):
    """A few real Adam steps on reconstruction MSE so the exported weights
    are trained (moved off init), incl. updated BN running stats."""
    import jax.numpy as jnp
    import optax

    tx = optax.adam(1e-3)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, **({"batch_stats": stats} if stats else {})},
                x, rngs=rngs, train=True,
                mutable=["batch_stats"] if stats else [],
            )
            return jnp.mean(jnp.square(out.output.astype(jnp.float32) - x)), mut

        (_, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), (
            mut.get("batch_stats", stats) if mut else stats
        ), opt

    for _ in range(steps):
        params, stats, opt = step(params, stats, opt)
    return ({"params": params, "batch_stats": stats} if stats
            else {"params": params})


@pytest.mark.slow
def test_exported_embed_vaes_restore_in_reference_graph(tmp_path):
    """VERDICT r2 item 7: the 3-VAE embed model (EmbedTask's UNetAcoustic +
    UNetSound-large + UNetVideo — the models knn.py/retrieve.py consume)
    trained HERE, exported to ONE TF1 checkpoint, restored by the
    reference-shaped THREE-scope graph via tf.train.Saver (which
    hard-fails on any missing/renamed/mis-shaped variable), with forward
    parity per modality."""
    import jax.numpy as jnp

    from acoustic_image_generation_tpu.core.tf1_export import (
        export_scope,
        save_tf1_checkpoint,
    )
    from acoustic_image_generation_tpu.models import (
        UNetAcoustic,
        UNetSound,
        UNetVideo,
    )

    rng = np.random.default_rng(23)
    ac_np = rng.random((2, 36, 48, 12)).astype(np.float32)
    sp_np = rng.random((2, 193, 257, 1)).astype(np.float32)
    vi_np = rng.random((1, 224, 298, 3)).astype(np.float32)

    tensors = {}
    ours = {}
    for key, scope, model, x in (
        ("acoustic", "UNetAcoustic", UNetAcoustic(), ac_np),
        ("audio", "UNetAudio", UNetSound(variant="large"), sp_np),
        ("video", "UNet", UNetVideo(), vi_np),
    ):
        rngs = {"params": jax.random.key(11), "latent": jax.random.key(1)}
        variables = model.init(rngs, x, train=True)
        variables = _short_train(
            model, variables, x, {"latent": jax.random.key(2)}
        )
        tensors.update(export_scope(variables, scope))
        apply_vars = {"params": variables["params"]}
        if "batch_stats" in variables:
            apply_vars["batch_stats"] = variables["batch_stats"]
        ours[key] = np.asarray(
            model.apply(apply_vars, x, sample=False, train=False).output
        )

    ckpt_path = save_tf1_checkpoint(str(tmp_path / "embed3.ckpt"), tensors)

    with tf.Graph().as_default():
        ac = v1.placeholder(tf.float32, (None, 36, 48, 12))
        sp = v1.placeholder(tf.float32, (None, 193, 257, 1))
        vi = v1.placeholder(tf.float32, (None, 224, 298, 3))
        out_ac, _ = _build_tf_unet_acoustic(ac)
        out_au, _ = _build_tf_unet_audio(sp)
        out_vi = _build_tf_unet_video(vi)
        with v1.Session() as sess:
            v1.train.Saver().restore(sess, ckpt_path)
            tf_ac, tf_au, tf_vi = sess.run(
                [out_ac, out_au, out_vi], {ac: ac_np, sp: sp_np, vi: vi_np}
            )

    np.testing.assert_allclose(ours["acoustic"], tf_ac, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ours["audio"], tf_au, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ours["video"], tf_vi, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_exported_dualcamnet_restores_in_reference_graph(tmp_path):
    """VERDICT r2 item 7: a DualCamNet trained HERE exports to a checkpoint
    the reference's own graph (the saveimagesresnet.py consumer) restores
    via tf.train.Saver, with logit parity."""
    import jax.numpy as jnp
    import optax

    from acoustic_image_generation_tpu.core.tf1_export import (
        export_scope,
        save_tf1_checkpoint,
    )
    from acoustic_image_generation_tpu.models import DualCamNet
    from acoustic_image_generation_tpu.models.dualcamnet import clip_logits

    rng = np.random.default_rng(29)
    x_np = rng.random((24, 36, 48, 12)).astype(np.float32)
    labels = jax.nn.one_hot(jnp.asarray([0, 3]), 10)

    model = DualCamNet(num_classes=10)
    params = model.init({"params": jax.random.key(4)}, x_np)["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            fl = model.apply({"params": p}, x_np)
            logits = clip_logits(fl.astype(jnp.float32), 12)
            return -jnp.mean(jnp.sum(labels * jax.nn.log_softmax(logits), -1))

        _, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt

    for _ in range(3):
        params, opt = step(params, opt)
    ours = np.asarray(model.apply({"params": params}, x_np))

    ckpt_path = save_tf1_checkpoint(
        str(tmp_path / "exported_dcn.ckpt"),
        export_scope({"params": params}, "DualCamNet", slim=True),
    )

    with tf.Graph().as_default():
        x = v1.placeholder(tf.float32, (None, 36, 48, 12))
        logits = _build_tf_dualcamnet(x)
        with v1.Session() as sess:
            v1.train.Saver().restore(sess, ckpt_path)
            tf_logits = sess.run(logits, {x: x_np})

    np.testing.assert_allclose(ours, tf_logits, rtol=2e-4, atol=2e-3)
