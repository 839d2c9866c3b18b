"""Warm-start flows: params-only restore, per-modality overlays from both
checkpoint formats (reference init flags, mfcctrainer.py:163-234)."""

import numpy as np
import pytest

from acoustic_image_generation_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    ParallelConfig,
    RunConfig,
)
from acoustic_image_generation_tpu.data.pipeline import RawBatch
from acoustic_image_generation_tpu.train import checkpoint as ckpt_mod
from acoustic_image_generation_tpu.train.reconstruct import ReconstructTask
from acoustic_image_generation_tpu.train.trainer import Trainer
from acoustic_image_generation_tpu.train.warmstart import (
    apply_init_checkpoints,
    overlay_model,
    restore_params_only,
)

import jax


def make_raw(n=8, frames=12, seed=0):
    rng = np.random.default_rng(seed)
    return RawBatch(
        acoustic=rng.random((n, frames, 36, 48, 12), dtype=np.float32),
        audio=rng.integers(-3000, 3000, (n, frames, 1024)).astype(np.int32),
        video=rng.integers(0, 255, (n, frames, 224, 298, 3)).astype(np.uint8),
        action=np.zeros(n, np.int32),
        location=np.zeros(n, np.int32),
        valid=n,
    )


def make_cfg(tmp_path, **run_kw):
    return ExperimentConfig(
        data=DataConfig(batch_size=8),
        model=ModelConfig(encoder_type="Ac"),
        optim=OptimConfig(num_epochs=1),
        run=RunConfig(exp_name="ws", checkpoint_dir=str(tmp_path), **run_kw),
        parallel=ParallelConfig(compute_dtype="float32"),
    )


@pytest.mark.slow
def test_params_only_restore_and_overlay(tmp_path):
    cfg = make_cfg(tmp_path)
    trainer = Trainer(ReconstructTask(cfg), cfg)
    raw = make_raw()
    state = trainer.init_state(raw)
    # advance one step so the saved params differ from a fresh init
    p0 = jax.device_get(state.params)
    state2, _ = trainer.train_step(state, raw)
    path = ckpt_mod.save_checkpoint(trainer.run_dir, 0, state2)
    saved = jax.device_get(state2.params)

    fresh = trainer.init_state(make_raw(seed=1))
    restored = restore_params_only(fresh, path)
    got = jax.device_get(restored.params)
    leaf = lambda t: t["model"]["layer1"]["conv_1"]["kernel"]
    np.testing.assert_array_equal(leaf(got), leaf(saved))
    assert not np.array_equal(leaf(got), leaf(p0))
    # optimizer state untouched (fresh zeros)
    mu = jax.device_get(restored.opt_state)[0].mu
    assert float(np.abs(leaf(mu)).max()) == 0.0

    # per-modality overlay from our format
    fresh2 = trainer.init_state(make_raw(seed=2))
    overlaid = overlay_model(fresh2, "model", path)
    got2 = jax.device_get(overlaid.params)
    np.testing.assert_array_equal(leaf(got2), leaf(saved))

    # config-driven wiring (init_checkpoint)
    cfg3 = make_cfg(tmp_path, init_checkpoint=path)
    trainer3 = Trainer(ReconstructTask(cfg3), cfg3)
    fresh3 = trainer3.init_state(make_raw(seed=3))
    state3 = apply_init_checkpoints(fresh3, cfg3)
    got3 = jax.device_get(state3.params)
    np.testing.assert_array_equal(leaf(got3), leaf(saved))


def test_overlay_from_tf_checkpoint(tmp_path):
    tf = pytest.importorskip("tensorflow")
    v1 = tf.compat.v1
    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(3, 3, 12, 128)).astype(np.float32)
    path = str(tmp_path / "ac.ckpt")
    with tf.Graph().as_default(), v1.Session() as sess:
        var = v1.get_variable("UNetAcoustic/layer1/conv_1/kernel", initializer=kernel)
        sess.run(v1.global_variables_initializer())
        v1.train.Saver([var]).save(sess, path)

    cfg = make_cfg(tmp_path)
    trainer = Trainer(ReconstructTask(cfg), cfg)

    # hand-build a minimal state carrying just the needed leaf
    from acoustic_image_generation_tpu.train.state import TrainState

    params = {"acoustic": {"layer1": {"conv_1": {"kernel": np.zeros((3, 3, 12, 128), np.float32)}}}}
    state = TrainState(step=0, params=params, batch_stats={}, opt_state=())
    out = overlay_model(state, "acoustic", path)
    np.testing.assert_array_equal(
        out.params["acoustic"]["layer1"]["conv_1"]["kernel"], kernel
    )
