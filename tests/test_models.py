"""Model zoo forward-shape and wiring tests (golden-shape parity with the
reference architectures, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acoustic_image_generation_tpu.models import (
    DualCamNet,
    ResNet50,
    UNetAcoustic,
    UNetAcResNet,
    UNetEnergy,
    UNetSound,
    UNetVideo,
)
from acoustic_image_generation_tpu.models.dualcamnet import clip_logits
from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap

RNGS = {"params": jax.random.key(0), "latent": jax.random.key(1)}


def test_unet_acoustic_shapes():
    m = UNetAcoustic()
    x = jnp.zeros((2, 36, 48, 12))
    var = m.init(RNGS, x)
    out = m.apply(var, x, rngs={"latent": jax.random.key(2)})
    assert out.output.shape == (2, 36, 48, 12)
    assert out.z.shape == (2, 150)
    assert out.mean.shape == (2, 150)
    assert out.std.shape == (2, 150)
    assert out.features.shape == (2, 12, 16, 133)
    assert np.all(np.asarray(out.output) >= 0) and np.all(np.asarray(out.output) <= 1)


def test_unet_acoustic_external_latent():
    m = UNetAcoustic()
    x = jnp.zeros((2, 36, 48, 12))
    var = m.init(RNGS, x)
    ext = (jnp.ones((2, 150)), jnp.zeros((2, 150)))
    out = m.apply(var, x, external_latent=ext, rngs={"latent": jax.random.key(2)})
    # std2 = 0 -> z must equal the external mean exactly (unet_z.py:63)
    np.testing.assert_allclose(np.asarray(out.z), 1.0)


@pytest.mark.parametrize("skips", [0, 1, 2])
def test_unet_acresnet_shapes(skips):
    m = UNetAcResNet(skips=skips)
    mfccmap = tile_mfccmap(jnp.zeros((2, 12)))
    feat = jnp.zeros((2, 12, 16, 12))
    var = m.init(RNGS, mfccmap, feat)
    out = m.apply(var, mfccmap, feat, rngs={"latent": jax.random.key(2)})
    assert out.output.shape == (2, 36, 48, 12)
    assert out.z.shape == (2, 150)
    assert out.features.shape == (2, 12, 16, 145)  # 133 + 12 concat


def test_unet_acresnet_exposes_presigmoid_logits():
    """`VaeOutput.logits` must be the exact pre-sigmoid of `output`: the
    logit-space BCE recipe (scripts/_study_lib.Flagship recon='bce', the
    dead-sigmoid-collapse repair) depends on sigmoid(logits) == output."""
    m = UNetAcResNet(skips=1)
    mfccmap = tile_mfccmap(jax.random.uniform(jax.random.key(5), (2, 12)))
    feat = jax.random.uniform(jax.random.key(6), (2, 12, 16, 12))
    var = m.init(RNGS, mfccmap, feat)
    out = m.apply(var, mfccmap, feat, rngs={"latent": jax.random.key(2)})
    assert out.logits is not None and out.logits.shape == out.output.shape
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(out.logits)), np.asarray(out.output),
        rtol=0, atol=1e-7,
    )


def test_unet_acresnet_ae_mode():
    m = UNetAcResNet(embedding=True)
    mfccmap = tile_mfccmap(jax.random.uniform(jax.random.key(3), (2, 12)))
    feat = jax.random.uniform(jax.random.key(4), (2, 12, 16, 12))
    var = m.init(RNGS, mfccmap, feat)
    out = m.apply(var, mfccmap, feat)
    assert out.std is None
    z = np.asarray(out.z)
    assert z.min() == pytest.approx(0.0, abs=1e-6)
    assert z.max() == pytest.approx(1.0, abs=1e-6)


def test_resnet50_conv_map_shape():
    m = ResNet50()
    x = jnp.zeros((1, 224, 298, 3))
    var = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(var, x, train=False)
    assert out.shape == (1, 12, 16, 12)
    # BN stats exist and params look like resnet50 (conv1 7x7x3x64)
    assert var["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert "batch_stats" in var


def test_resnet50_train_mode_updates_batch_stats():
    m = ResNet50()
    x = jnp.ones((1, 224, 298, 3))
    var = m.init({"params": jax.random.key(0)}, x, train=False)
    out, mutated = m.apply(var, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 12, 16, 12)
    assert "batch_stats" in mutated


def test_dualcamnet_shapes():
    m = DualCamNet(num_classes=10)
    x = jnp.zeros((24, 36, 48, 12))  # 2 clips x 12 frames
    var = m.init({"params": jax.random.key(0)}, x)
    logits = m.apply(var, x)
    assert logits.shape == (24, 10)
    assert clip_logits(logits).shape == (2, 10)


def test_unet_sound_large_shapes():
    m = UNetSound(variant="large")
    x = jnp.zeros((2, 193, 257, 1))
    var = m.init(RNGS, x, train=False)
    out, _ = m.apply(
        var, x, train=True, rngs={"latent": jax.random.key(2)}, mutable=["batch_stats"]
    )
    assert out.output.shape == (2, 193, 257, 1)
    assert out.z.shape == (2, 256)


def test_unet_sound_small_shapes():
    m = UNetSound(variant="small")
    x = jnp.zeros((2, 99, 257, 1))
    var = m.init(RNGS, x, train=False)
    out = m.apply(var, x, train=False)
    assert out.output.shape == (2, 99, 257, 1)
    assert out.z.shape == (2, 128)


def test_unet_video_shapes():
    m = UNetVideo()
    x = jnp.zeros((1, 224, 298, 3))
    var = m.init(RNGS, x, train=False)
    out = m.apply(var, x, train=False)
    assert out.output.shape == (1, 224, 298, 3)
    assert out.z.shape == (1, 1024)


def test_unet_energy_shapes():
    m = UNetEnergy()
    x = jnp.zeros((2, 36, 48, 1))
    var = m.init(RNGS, x, train=False)
    out = m.apply(var, x, train=False)
    assert out.output.shape == (2, 36, 48, 1)
    assert out.z.shape == (2, 128)
    assert np.all(np.asarray(out.output) >= 0)  # final ReLU


def test_tile_mfccmap_matches_reference_tile():
    mfcc = jnp.arange(24, dtype=jnp.float32).reshape(2, 12)
    tiled = tile_mfccmap(mfcc)
    assert tiled.shape == (2, 36, 48, 12)
    # every spatial position carries the per-sample mfcc vector
    np.testing.assert_array_equal(np.asarray(tiled[1, 17, 31]), np.asarray(mfcc[1]))


def test_decoder_energy_shapes():
    from acoustic_image_generation_tpu.models import DecoderEnergy

    m = DecoderEnergy()
    z = jnp.ones((2, 150))
    var = m.init({"params": jax.random.key(0)}, z)
    out = m.apply(var, z)
    assert out.shape == (2, 36, 48, 1)
    assert np.all(np.asarray(out) >= 0)  # final relu (decoders.py:118)


def test_decoder_video_shapes():
    from acoustic_image_generation_tpu.models import DecoderVideo

    m = DecoderVideo()
    z = jnp.ones((1, 150))
    var = m.init({"params": jax.random.key(0)}, z)
    out = m.apply(var, z)
    assert out.shape == (1, 224, 298, 3)
    o = np.asarray(out)
    assert np.all((o >= 0) & (o <= 1))  # final sigmoid (decoders.py:49)


def test_decoder_audio_shapes():
    from acoustic_image_generation_tpu.models import DecoderAudio

    m = DecoderAudio()
    z = jnp.ones((1, 150))
    var = m.init({"params": jax.random.key(0)}, z)
    out = m.apply(var, z)
    assert out.shape == (1, 12288, 1, 1)  # 1 s waveform (decoders.py:187)


def test_mean_std_normalizes_without_scale():
    from acoustic_image_generation_tpu.models import MeanStd

    m = MeanStd()
    x = jnp.asarray(np.random.default_rng(0).normal(3.0, 2.0, (64, 6)), jnp.float32)
    var = m.init({"params": jax.random.key(0)}, x)
    # no gamma: only a beta offset parameter exists (meanvariance.py:34 scale=False)
    leaves = jax.tree_util.tree_leaves_with_path(var["params"])
    names = [jax.tree_util.keystr(p) for p, _ in leaves]
    assert any("bias" in n for n in names) and not any("scale" in n for n in names)
    out, _ = m.apply(var, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out).mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out).std(0), 1.0, atol=1e-2)
