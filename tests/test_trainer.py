"""End-to-end training smoke tests on the virtual 8-device CPU mesh:
synthetic shards -> loader -> jitted sharded train step -> validate ->
checkpoint -> restore -> test (SURVEY.md §4 test strategy).

The box running CI may have a single CPU core, so the fast path uses the
acoustic-only ReconstructTask; the flagship GenerationTask runs with a
structurally identical reduced-depth ResNet (1 unit/block)."""

import glob
import os

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
from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
from acoustic_image_generation_tpu.train.checkpoint import BestTracker
from acoustic_image_generation_tpu.train.generation import GenerationTask
from acoustic_image_generation_tpu.train.reconstruct import ReconstructTask
from acoustic_image_generation_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("acivw")
    # 4 videos x 2 seconds = 8 sliding windows -> one full batch of 8
    lists = write_synthetic_dataset(
        str(out), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    return lists


def make_config(tmp_path, **model_kw) -> ExperimentConfig:
    return ExperimentConfig(
        data=DataConfig(batch_size=8, sample_length=1),
        model=ModelConfig(**model_kw),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=2),
        run=RunConfig(exp_name="smoke", checkpoint_dir=str(tmp_path), seed=0),
        parallel=ParallelConfig(compute_dtype="float32"),
    )


@pytest.mark.slow
def test_reconstruct_end_to_end(tiny_dataset, tmp_path):
    cfg = make_config(tmp_path, encoder_type="Ac")
    train_loader = AcousticImageDataLoader(
        tiny_dataset["training"], "training", cfg.data.batch_size
    )
    valid_loader = AcousticImageDataLoader(
        tiny_dataset["validation"], "validation", cfg.data.batch_size
    )
    assert train_loader.num_windows == 8

    trainer = Trainer(ReconstructTask(cfg), cfg)
    assert trainer.mesh.devices.size == 8  # virtual v5e-8

    state = trainer.fit(train_loader, valid_loader)
    assert int(state.step) == 2  # 2 epochs x 1 full batch

    run_dir = trainer.run_dir
    assert os.path.exists(os.path.join(run_dir, "model.txt"))
    assert os.path.exists(os.path.join(run_dir, "configuration.txt"))
    assert glob.glob(os.path.join(run_dir, "epoch_*.ckpt"))
    best = BestTracker.read_best_epoch(run_dir)
    assert best >= 0

    # restore into a fresh template and test
    path = os.path.join(run_dir, f"epoch_{best}.ckpt")
    for first in train_loader.batches(0):
        break
    template = trainer.init_state(first)
    restored = trainer.restore(path, template)
    results = trainer.test(restored, valid_loader, epoch=best)
    assert np.isfinite(results["mse"])
    assert os.path.exists(os.path.join(run_dir, f"test_accuracy_{best}.txt"))

    # training reduced reconstruction error vs the fresh initialization
    fresh = trainer.evaluate(template, valid_loader)
    assert results["mse"] < fresh["mse"]


@pytest.mark.slow
def test_generation_step_and_eval(tiny_dataset, tmp_path):
    """Flagship wiring (reduced-depth ResNet): one sharded train step +
    masked eval on the 8-device mesh."""
    cfg = make_config(
        tmp_path, embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1)
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    trainer = Trainer(GenerationTask(cfg), cfg)
    for raw in loader.batches(0):
        break
    state = trainer.init_state(raw)
    import jax

    p_before = jax.device_get(state.params)  # state buffers are donated
    s1, metrics = trainer.train_step(state, raw)
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["loss"]) and np.isfinite(m["mse"])
    assert int(s1.step) == 1
    # Reference gradient structure (mfcctrainer.py:64, vision.py:68-70):
    # the ResNet trunk is frozen bit-exactly; conv_map and the generator
    # train.
    p_after = jax.device_get(s1.params)
    for k, sub in p_before["resnet"].items():
        pairs = zip(
            jax.tree_util.tree_leaves(sub),
            jax.tree_util.tree_leaves(p_after["resnet"][k]),
        )
        unchanged = all(np.array_equal(a, b) for a, b in pairs)
        assert unchanged == (k not in ("conv_map", "logits")), k
    gen_pairs = zip(
        jax.tree_util.tree_leaves(p_before["generator"]),
        jax.tree_util.tree_leaves(p_after["generator"]),
    )
    assert not all(np.array_equal(a, b) for a, b in gen_pairs)
    val = trainer.evaluate(s1, loader)
    assert {"mse", "mse0", "mse1", "mse2", "mse3"} <= set(val)
    assert np.isfinite(val["mse"])


@pytest.mark.slow
def test_generation_bce_loss_option(tiny_dataset, tmp_path):
    """OptimConfig.bce (non-reference opt-in, the dead-sigmoid-collapse
    repair): the production GenerationTask trains on the logit-space CE
    term; the reported mse metric stays the reference's output-space
    MSE; the total decomposes as bce + latent_loss + regularization
    when mse/huber are off."""
    import dataclasses

    import jax

    cfg = make_config(
        tmp_path, embedding=True, mfcc=True, num_skip_conn=1,
        resnet_units=(1, 1, 1, 1),
    )
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, mse=False, huber=False,
                                       bce=True)
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    trainer = Trainer(GenerationTask(cfg), cfg)
    for raw in loader.batches(0):
        break
    state = trainer.init_state(raw)
    p_before = jax.device_get(state.params)  # state buffers are donated
    s1, metrics = trainer.train_step(state, raw)
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["bce"]) and m["bce"] > 0
    assert np.isfinite(m["mse"])  # still reported, not part of the total
    assert m["loss"] == pytest.approx(
        m["bce"] + m["latent_loss"] + m["regularization"], rel=1e-5
    )
    gen_changed = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_before["generator"]),
            jax.tree_util.tree_leaves(jax.device_get(s1.params)["generator"]),
        )
    )
    assert gen_changed


@pytest.mark.slow
def test_fsdp_shards_state_across_mesh(tiny_dataset, tmp_path):
    """ZeRO-style state sharding: large params + Adam moments split over the
    data axis; a train step runs and keeps the layout."""
    import jax
    from jax.sharding import PartitionSpec as P

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, sample_length=1),
        model=ModelConfig(encoder_type="Ac"),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
        run=RunConfig(exp_name="fsdp", checkpoint_dir=str(tmp_path)),
        parallel=ParallelConfig(compute_dtype="float32", fsdp=True),
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    trainer = Trainer(ReconstructTask(cfg), cfg)
    for raw in loader.batches(0):
        break
    state = trainer.init_state(raw)

    big = state.params["model"]["dense"]["kernel"]  # (150, 2304)
    assert big.sharding.spec == P(None, "data")
    small = state.params["model"]["final"]["bias"]
    assert small.sharding.spec == P()
    # Adam moments inherit the layout
    mu_big = state.opt_state[0].mu["model"]["dense"]["kernel"]
    assert mu_big.sharding.spec == P(None, "data")
    # a step preserves sharding and stays finite
    new_state, metrics = trainer.train_step(state, raw)
    assert new_state.params["model"]["dense"]["kernel"].sharding.spec == P(None, "data")
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


@pytest.mark.slow
def test_resume_reproduces_uninterrupted_run(tiny_dataset, tmp_path):
    """checkpoint/resume determinism: 1 epoch + save + restore + 1 epoch
    equals 2 uninterrupted epochs bit-for-bit (keyed RNG policy + epoch
    numbering continued from the step counter)."""
    import dataclasses

    import jax

    from acoustic_image_generation_tpu.train import checkpoint as ckpt_mod

    loaders = lambda: (
        AcousticImageDataLoader(tiny_dataset["training"], "training", 8),
        AcousticImageDataLoader(tiny_dataset["validation"], "validation", 8),
    )

    cfg2 = make_config(tmp_path / "full", encoder_type="Ac")
    trainer = Trainer(ReconstructTask(cfg2), cfg2)
    tr, va = loaders()
    full = trainer.fit(tr, va)

    cfg1 = dataclasses.replace(
        cfg2,
        optim=dataclasses.replace(cfg2.optim, num_epochs=1),
        run=dataclasses.replace(cfg2.run, checkpoint_dir=str(tmp_path / "half")),
    )
    trainer1 = Trainer(ReconstructTask(cfg1), cfg1)
    tr, va = loaders()
    half = trainer1.fit(tr, va)
    path = ckpt_mod.save_checkpoint(trainer1.run_dir, "half", half)

    trainer2 = Trainer(ReconstructTask(cfg1), cfg1)
    tr, va = loaders()
    for first in tr.batches(0):
        break
    template = trainer2.init_state(first)
    resumed_start = trainer2.restore(path, template)
    resumed = trainer2.fit(tr, va, state=resumed_start)

    a = jax.device_get(full.params)
    b = jax.device_get(resumed.params)
    chex = jax.tree_util.tree_map(lambda x, y: np.array_equal(x, y), a, b)
    assert jax.tree_util.tree_all(chex)
    assert int(full.step) == int(resumed.step) == 2


@pytest.mark.slow
def test_midepoch_resume_reproduces_uninterrupted_run(tmp_path, tmp_path_factory):
    """A crash checkpoint taken mid-epoch resumes at the exact batch where
    the run stopped: the loader's per-epoch order is seeded and the
    per-step RNGs key off ``state.step``, so skipping the already-consumed
    batches continues the run bit-for-bit (vs the reference, which can only
    restart whole epochs — trainer/trainer.py:250)."""
    import dataclasses

    import jax

    out = tmp_path_factory.mktemp("acivw16")
    # 4 videos x 4 seconds = 16 sliding windows -> 2 batches of 8 per epoch
    lists = write_synthetic_dataset(
        str(out), num_classes=2, videos_per_class=2, seconds_per_video=4
    )
    loaders = lambda: (
        AcousticImageDataLoader(lists["training"], "training", 8),
        AcousticImageDataLoader(lists["validation"], "validation", 8),
    )

    cfg_full = make_config(tmp_path / "full", encoder_type="Ac")
    tr, va = loaders()
    full = Trainer(ReconstructTask(cfg_full), cfg_full).fit(tr, va)
    assert int(full.step) == 4  # 2 epochs x 2 steps

    # identical run that dies after the FIRST batch of epoch 1 (step 3)
    cfg_crash = dataclasses.replace(
        cfg_full,
        run=dataclasses.replace(cfg_full.run, checkpoint_dir=str(tmp_path / "crash")),
    )
    tr, va = loaders()

    class CrashingLoader:
        batch_size = tr.batch_size
        num_windows = tr.num_windows

        def batches(self, epoch):
            for i, b in enumerate(tr.batches(epoch)):
                yield b
                if epoch == 1 and i == 0:
                    raise IOError("simulated mid-epoch crash")

    trainer_crash = Trainer(ReconstructTask(cfg_crash), cfg_crash)
    with pytest.raises(IOError, match="mid-epoch"):
        trainer_crash.fit(CrashingLoader(), va)
    paths = glob.glob(
        os.path.join(trainer_crash.run_dir, "epoch_interrupted_1.ckpt")
    )
    assert paths, "no crash checkpoint written"

    # resume: finishes the second half of epoch 1 and nothing else
    cfg_res = dataclasses.replace(
        cfg_crash, optim=dataclasses.replace(cfg_crash.optim, num_epochs=1)
    )
    trainer_res = Trainer(ReconstructTask(cfg_res), cfg_res)
    tr2, va2 = loaders()
    for first in tr2.batches(0):
        break
    template = trainer_res.init_state(first)
    restored = trainer_res.restore(paths[0], template)
    assert int(restored.step) == 3
    resumed = trainer_res.fit(tr2, va2, state=restored)

    assert int(resumed.step) == int(full.step) == 4
    a = jax.device_get(full.params)
    b = jax.device_get(resumed.params)
    eq = jax.tree_util.tree_map(lambda x, y: np.array_equal(x, y), a, b)
    assert jax.tree_util.tree_all(eq)


@pytest.mark.slow
def test_ordinary_checkpoint_resume_trains_full_epochs(tmp_path, tmp_path_factory):
    """Restoring a NON-crash checkpoint into a run with different epoch
    geometry (other dataset size) must keep the reference's whole-epoch
    semantics: no batches are silently skipped. Only crash checkpoints
    (which carry a .meta.json position sidecar) resume mid-epoch."""
    import dataclasses

    import jax

    from acoustic_image_generation_tpu.train import checkpoint as ckpt_mod

    out_a = tmp_path_factory.mktemp("acivw_a")
    lists_a = write_synthetic_dataset(  # 8 windows -> 1 step/epoch at bs=8
        str(out_a), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    out_b = tmp_path_factory.mktemp("acivw_b")
    lists_b = write_synthetic_dataset(  # 24 windows -> 3 steps/epoch
        str(out_b), num_classes=2, videos_per_class=3, seconds_per_video=4
    )

    cfg = make_config(tmp_path, encoder_type="Ac")
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, num_epochs=1)
    )
    tr_a = AcousticImageDataLoader(lists_a["training"], "training", 8)
    va_a = AcousticImageDataLoader(lists_a["validation"], "validation", 8)
    trainer = Trainer(ReconstructTask(cfg), cfg)
    pre = trainer.fit(tr_a, va_a)
    assert int(pre.step) == 1
    path = ckpt_mod.save_checkpoint(trainer.run_dir, "pretrain", pre)

    # fine-tune on the bigger dataset: all 3 batches of the epoch train
    # (the old step % steps_per_epoch inference would have skipped 1)
    tr_b = AcousticImageDataLoader(lists_b["training"], "training", 8)
    va_b = AcousticImageDataLoader(lists_b["validation"], "validation", 8)
    trainer2 = Trainer(ReconstructTask(cfg), cfg)
    for first in tr_b.batches(0):
        break
    restored = trainer2.restore(path, trainer2.init_state(first))
    tuned = trainer2.fit(tr_b, va_b, state=restored)
    assert int(tuned.step) == 1 + 3


@pytest.mark.slow
def test_reconstruct_energy_step(tiny_dataset, tmp_path):
    """Energy-map recipe (encoder_type=Energy -> BN-less UNetEnergy on the
    min-max-normalized first acoustic channel): one sharded train step +
    eval."""
    cfg = make_config(tmp_path, encoder_type="Energy")
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    trainer = Trainer(ReconstructTask(cfg), cfg)
    for raw in loader.batches(0):
        break
    state = trainer.init_state(raw)
    assert state.batch_stats == {}  # no BN anywhere in this family
    s1, metrics = trainer.train_step(state, raw)
    assert np.isfinite(float(metrics["loss"]))
    val = trainer.evaluate(s1, loader)
    assert np.isfinite(val["mse"])


@pytest.mark.slow
def test_crash_checkpoint_on_midtrain_failure(tiny_dataset, tmp_path):
    """Failure containment (SURVEY.md §5 — the reference has none): a
    loader fault mid-epoch persists an interrupted_{epoch} checkpoint
    before re-raising, and that checkpoint is restorable."""
    from acoustic_image_generation_tpu.train import checkpoint as ckpt_mod

    cfg = make_config(tmp_path, encoder_type="Ac")
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)

    class FaultyLoader:
        batch_size = loader.batch_size
        num_windows = loader.num_windows

        def batches(self, epoch):
            yield from loader.batches(epoch)
            raise IOError("simulated shard corruption")

    trainer = Trainer(ReconstructTask(cfg), cfg)
    with pytest.raises(IOError, match="simulated"):
        trainer.fit(FaultyLoader(), loader)
    paths = glob.glob(os.path.join(trainer.run_dir, "epoch_interrupted_*.ckpt"))
    assert paths, "no crash checkpoint written"

    for first in loader.batches(0):
        break
    template = trainer.init_state(first)
    restored = trainer.restore(paths[0], template)
    assert int(restored.step) >= 1  # the completed steps were persisted


@pytest.mark.slow
def test_trunk_feature_cache_matches_full_step(tiny_dataset, tmp_path):
    """Frozen-trunk feature caching (train/feature_cache.py): with
    trunk_bn="frozen" the cached-feature train step must produce the same
    loss and parameter updates as the full step, and epoch 2 must be
    served from cache (zero misses)."""
    import jax

    kw = dict(
        embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1),
        trunk_bn="frozen",
    )
    cfg_full = make_config(tmp_path / "full", **kw)
    cfg_cached = make_config(
        tmp_path / "cached", **kw, cache_trunk_features=True,
        cache_device_bytes=0,  # host tier only; device tier tested below
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    for raw in loader.batches(0):
        break

    tr_full = Trainer(GenerationTask(cfg_full), cfg_full)
    tr_cached = Trainer(GenerationTask(cfg_cached), cfg_cached)
    assert tr_full.feature_cache is None
    assert tr_cached.feature_cache is not None

    s_full = tr_full.init_state(raw)
    s_cached = tr_cached.init_state(raw)

    s_full, m_full = tr_full.train_step(s_full, raw)
    s_cached, m_cached = tr_cached.train_step(s_cached, raw)
    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_cached["loss"]), rtol=1e-5
    )
    # params must match after the update (same grads either path)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_full.params)),
        jax.tree_util.tree_leaves(jax.device_get(s_cached.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)

    # second step on the same batch: served from cache
    misses_before = tr_cached.feature_cache.misses
    s_cached, m2 = tr_cached.train_step(s_cached, raw)
    assert tr_cached.feature_cache.misses == misses_before
    assert tr_cached.feature_cache.hits > 0
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_device_feature_cache_matches_full_step(tiny_dataset, tmp_path):
    """HBM-resident feature tier (train/feature_cache.DeviceFeatureCache):
    with a generous device budget the second step on a batch is served
    entirely from the device pool (the host tier sees zero traffic) and
    produces the same updates as the uncached full step."""
    import jax

    kw = dict(
        embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1),
        trunk_bn="frozen",
    )
    cfg_full = make_config(tmp_path / "full", **kw)
    cfg_dev = make_config(
        tmp_path / "dev", **kw, cache_trunk_features=True,
        cache_device_bytes=1 << 30,
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    for raw in loader.batches(0):
        break

    tr_full = Trainer(GenerationTask(cfg_full), cfg_full)
    tr_dev = Trainer(GenerationTask(cfg_dev), cfg_dev)
    assert tr_dev.device_cache is not None

    s_full = tr_full.init_state(raw)
    s_dev = tr_dev.init_state(raw)

    s_full, m_full = tr_full.train_step(s_full, raw)
    s_dev, m_dev = tr_dev.train_step(s_dev, raw)
    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_dev["loss"]), rtol=1e-5
    )
    # the miss populated the device pool, not the host cache
    assert tr_dev.device_cache.resident == int(raw.valid)
    assert len(tr_dev.feature_cache) == 0

    # second step: device-tier hit; host cache never consulted (the one
    # recorded miss is step 1's tier-2 probe before the trunk ran)
    misses_after_fill = tr_dev.feature_cache.misses
    s_dev, m2 = tr_dev.train_step(s_dev, raw)
    assert tr_dev.feature_cache.hits == 0
    assert tr_dev.feature_cache.misses == misses_after_fill

    # and the updates still match the full step, two steps in
    s_full, m_full2 = tr_full.train_step(s_full, raw)
    np.testing.assert_allclose(
        float(m_full2["loss"]), float(m2["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_full.params)),
        jax.tree_util.tree_leaves(jax.device_get(s_dev.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_device_feature_cache_spills_to_host(tiny_dataset, tmp_path):
    """A device budget with room for only part of the batch: the remainder
    spills to the host tier, and subsequent steps are still served without
    recomputing the trunk (mixed tiers take the host path)."""
    kw = dict(
        embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1),
        trunk_bn="frozen",
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    for raw in loader.batches(0):
        break

    # budget = exactly 3 windows' worth of features
    import jax.numpy as jnp

    frames = raw.frames
    cfg_probe = make_config(
        tmp_path / "probe", **kw, cache_trunk_features=True,
        cache_device_bytes=0,
    )
    tr_probe = Trainer(GenerationTask(cfg_probe), cfg_probe)
    s = tr_probe.init_state(raw)
    tr_probe.train_step(s, raw)  # populate host cache to size a window
    wid0 = int(raw.window_ids[0])
    per_window = tr_probe.feature_cache.get(wid0).nbytes

    cfg_small = make_config(
        tmp_path / "small", **kw, cache_trunk_features=True,
        cache_device_bytes=3 * per_window,
    )
    tr = Trainer(GenerationTask(cfg_small), cfg_small)
    s = tr.init_state(raw)
    s, m1 = tr.train_step(s, raw)
    assert tr.device_cache.resident == 3
    assert len(tr.feature_cache) == int(raw.valid) - 3

    # second step: mixed-tier path — the 3 resident rows come from the
    # device pool, the spilled rows from the host tier; the trunk must
    # never recompute and only the spilled rows touch the host cache
    def _boom(*a, **k):
        raise AssertionError("trunk recomputed on a fully cached batch")

    tr._trunk_features = _boom
    misses = tr.feature_cache.misses
    hits = tr.feature_cache.hits
    s, m2 = tr.train_step(s, raw)
    assert tr.feature_cache.misses == misses
    assert tr.feature_cache.hits == hits + (int(raw.valid) - 3)
    assert np.isfinite(float(m2["loss"]))

    # and the mixed step computes the same loss as a host-only cached
    # trainer stepped identically from the same init
    s_probe, p1 = tr_probe.train_step(tr_probe.init_state(raw), raw)
    s_probe, p2 = tr_probe.train_step(s_probe, raw)
    np.testing.assert_allclose(float(m2["loss"]), float(p2["loss"]), rtol=1e-5)
    del jnp, frames


@pytest.mark.slow
def test_feature_cache_f8_storage(tiny_dataset, tmp_path):
    """cache_features_dtype="f8_e4m3": every cache tier stores float8
    (half the footprint — the HBM pool buffer, the host rows, the disk
    rows), the cached steps upcast inside jit, and the one-time rounding
    keeps the loss within a small envelope of the exact-storage step."""
    import jax.numpy as jnp

    kw = dict(
        embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1),
        trunk_bn="frozen", cache_trunk_features=True,
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    for raw in loader.batches(0):
        break

    cfg_exact = make_config(tmp_path / "exact", **kw, cache_device_bytes=0)
    cfg_f8 = make_config(
        tmp_path / "f8", **kw, cache_device_bytes=1 << 30,
        cache_features_dtype="f8_e4m3",
    )
    tr_exact = Trainer(GenerationTask(cfg_exact), cfg_exact)
    tr_f8 = Trainer(GenerationTask(cfg_f8), cfg_f8)

    s_exact, m_exact = tr_exact.train_step(tr_exact.init_state(raw), raw)
    s_f8, m_f8 = tr_f8.train_step(tr_f8.init_state(raw), raw)

    # the HBM pool holds f8 rows — half the bytes, double the capacity
    assert tr_f8.device_cache.buf.dtype == jnp.float8_e4m3fn
    # features round through f8 exactly once; same batch, close loss
    np.testing.assert_allclose(
        float(m_exact["loss"]), float(m_f8["loss"]), rtol=0.05
    )

    # second step is served entirely from the f8 pool
    misses = tr_f8.feature_cache.misses
    s_f8, m2 = tr_f8.train_step(s_f8, raw)
    assert tr_f8.feature_cache.misses == misses
    assert np.isfinite(float(m2["loss"]))

    # host tier + cross-run disk tier store f8 rows too, and the disk
    # store's identity includes the dtype (no mixing with a bf16 store)
    cfg_host = make_config(
        tmp_path / "host", **kw, cache_device_bytes=0,
        cache_features_dtype="f8_e4m3",
        cache_disk_dir=str(tmp_path / "store"),
    )
    tr_host = Trainer(GenerationTask(cfg_host), cfg_host)
    s_host = tr_host.init_state(raw)
    tr_host._attach_disk(loader, s_host, tr_host.feature_cache)
    tr_host.train_step(s_host, raw)
    row = tr_host.feature_cache.get(int(raw.window_ids[0]))
    assert row.dtype == jnp.float8_e4m3fn
    assert tr_host.feature_cache.disk.meta["dtype"] == "float8_e4m3fn"

    # unknown storage dtype is rejected at construction
    cfg_bad = make_config(
        tmp_path / "bad", **kw, cache_features_dtype="int4"
    )
    with pytest.raises(ValueError, match="cache_features_dtype"):
        Trainer(GenerationTask(cfg_bad), cfg_bad)


def test_async_checkpointer_durable_and_donation_safe(tmp_path):
    """AsyncCheckpointer: the background save is byte-identical to the
    synchronous one, survives the caller donating the state's buffers to
    the very next step (fit's steady state), and close() makes it
    durable."""
    import jax
    import jax.numpy as jnp

    from acoustic_image_generation_tpu.train import checkpoint as ckpt_mod
    from acoustic_image_generation_tpu.train.state import TrainState

    params = {"w": jnp.arange(8, dtype=jnp.float32), "b": jnp.float32(1.5)}
    state = TrainState(
        step=jnp.int32(3),
        params=params,
        batch_stats={"bn": jnp.ones((4,), jnp.float32)},
        opt_state={"m": jnp.zeros((8,), jnp.float32)},
    )
    sync_path = ckpt_mod.save_checkpoint(str(tmp_path / "sync"), 0, state)

    donate = jax.jit(
        lambda s: jax.tree_util.tree_map(lambda x: x * 0, s), donate_argnums=(0,)
    )
    saver = ckpt_mod.AsyncCheckpointer()
    try:
        async_path = saver.save(str(tmp_path / "async"), 0, state)
        state = donate(state)  # invalidates the original buffers
        jax.block_until_ready(state)
        saver.wait()
    finally:
        saver.close()
    with open(sync_path, "rb") as f_sync, open(async_path, "rb") as f_async:
        assert f_sync.read() == f_async.read()
    # restore round-trips through the async file
    restored = ckpt_mod.restore_checkpoint(
        async_path, jax.tree_util.tree_map(jnp.zeros_like, state)
    )
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(8))
    assert int(restored.step) == 3


@pytest.mark.slow
def test_eval_rides_feature_cache(tiny_dataset, tmp_path):
    """Validation over the frozen trunk rides a per-loader feature cache:
    cached evaluate() matches the uncached one exactly (same state, same
    padded remainder batches), and a second evaluate on the same loader
    never re-runs the trunk."""
    kw = dict(
        embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1),
        trunk_bn="frozen",
    )
    cfg_full = make_config(tmp_path / "full", **kw)
    cfg_cached = make_config(
        tmp_path / "cached", **kw, cache_trunk_features=True,
        cache_device_bytes=0,
    )
    train_loader = AcousticImageDataLoader(
        tiny_dataset["training"], "training", 8
    )
    # batch 8 over a smaller validation split -> padded remainder batch,
    # exercising the valid mask against repeated padded feature rows
    valid_loader = AcousticImageDataLoader(
        tiny_dataset["validation"], "validation", 8
    )
    for raw in train_loader.batches(0):
        break

    tr_full = Trainer(GenerationTask(cfg_full), cfg_full)
    tr_cached = Trainer(GenerationTask(cfg_cached), cfg_cached)
    s_full = tr_full.init_state(raw)
    s_cached = tr_cached.init_state(raw)

    res_full = tr_full.evaluate(s_full, valid_loader)
    res_cached = tr_cached.evaluate(s_cached, valid_loader)
    assert res_full.keys() == res_cached.keys()
    for k in res_full:
        np.testing.assert_allclose(res_full[k], res_cached[k], rtol=1e-5)

    # the valid loader got its own cache (ids are loader-local, so the
    # training loader's cache must not be shared)
    cache = tr_cached._eval_caches[valid_loader]
    assert len(cache) == valid_loader.num_windows
    assert cache is not tr_cached.feature_cache

    # second pass: served entirely from the cache — the trunk never runs
    def _boom(*a, **k):
        raise AssertionError("trunk recomputed on a fully cached eval set")

    tr_cached._trunk_features = _boom
    misses = cache.misses
    res_again = tr_cached.evaluate(s_cached, valid_loader)
    assert cache.misses == misses
    for k in res_full:
        np.testing.assert_allclose(res_again[k], res_cached[k], rtol=1e-6)


@pytest.mark.slow
def test_trunk_bn_frozen_disables_stat_updates(tiny_dataset, tmp_path):
    """trunk_bn="frozen": trunk BN running stats stay bit-identical through
    a train step; conv_map (head) stats still update like the reference's
    UPDATE_OPS (mfcctrainer.py:75-79)."""
    import jax

    cfg = make_config(
        tmp_path, embedding=True, mfcc=True, num_skip_conn=1,
        resnet_units=(1, 1, 1, 1), trunk_bn="frozen",
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    for raw in loader.batches(0):
        break
    trainer = Trainer(GenerationTask(cfg), cfg)
    state = trainer.init_state(raw)
    stats_before = jax.device_get(state.batch_stats)
    s1, _ = trainer.train_step(state, raw)
    stats_after = jax.device_get(s1.batch_stats)
    for k in stats_before["resnet"]:
        same = all(
            np.array_equal(a, b)
            for a, b in zip(
                jax.tree_util.tree_leaves(stats_before["resnet"][k]),
                jax.tree_util.tree_leaves(stats_after["resnet"][k]),
            )
        )
        assert same == (k != "conv_map"), k


@pytest.mark.slow
def test_fsdp_layout_is_partitioner_clean_and_matches_dp():
    """Round-2 FSDP acceptance (VERDICT item 2): the 8-device dryrun must
    compile with ZERO SPMD "involuntary full rematerialization" warnings
    and produce DP==FSDP loss trajectories over 3 steps. Runs in a
    subprocess to capture XLA's C++ stderr."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # don't dial the TPU tunnel
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=3000,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "Involuntary full rematerialization" not in out, out[-3000:]
    assert "ok (== dp)" in out, out[-3000:]


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("AIG_FULL_TESTS") != "1",
    reason="full-depth 3/4/6/3 fwd+bwd compile takes tens of minutes on a "
    "1-core CPU host; set AIG_FULL_TESTS=1 to run (round-3 VERDICT item 3)",
)
def test_full_depth_partitioner_clean():
    """Compile (no execute) the PRODUCTION-depth train step under DP, FSDP
    and TP on the 8-device mesh: zero SPMD involuntary-rematerialization
    warnings allowed. The reduced-depth dryrun validates execution; this
    validates the full 3/4/6/3 graph the real slice would run."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "compile_full_depth", "8"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=7200,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "Involuntary full rematerialization" not in out, out[-3000:]
    for name in ("dp", "fsdp", "tp"):
        assert f"{name} compiled ok" in out, out[-3000:]


@pytest.mark.slow
def test_fit_logs_media_when_tensorboard_set(tiny_dataset, tmp_path):
    """Per-epoch reconstruction media (mfcctrainer.py:278-297 capability):
    with run.tensorboard set, fit() writes image panels + scalar records
    through utils.Logger."""
    import dataclasses
    import glob as globmod

    cfg = make_config(
        tmp_path, embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1)
    )
    cfg = dataclasses.replace(
        cfg,
        run=dataclasses.replace(cfg.run, tensorboard=str(tmp_path / "tb")),
        optim=dataclasses.replace(cfg.optim, num_epochs=1),
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    trainer = Trainer(GenerationTask(cfg), cfg)
    trainer.fit(loader, loader)
    log_dir = os.path.join(str(tmp_path / "tb"), cfg.run.exp_name)
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
    media = globmod.glob(os.path.join(log_dir, "media", "*.png"))
    names = {os.path.basename(p).rsplit("_", 1)[0] for p in media}
    assert {"valid_generated", "valid_real", "valid_video"} <= names


@pytest.mark.slow
def test_tensor_parallel_shards_channels(tiny_dataset, tmp_path):
    """Tensor parallelism (parallel.tp_sharding): wide-output-channel
    4-D CONV kernels split over the model axis of a (data, model) mesh;
    2-D dense kernels stay replicated (the round-3 rule — column-
    splitting the latent-bordering denses forces involuntary full
    rematerialization, mesh.py:148-158); Adam moments inherit the
    layout; a train step runs, keeps it, and stays finite. Uses the
    flagship (reduced trunk): its ResNet convs are the >=256-channel
    tensors the rule exists for."""
    import jax
    from jax.sharding import PartitionSpec as P

    cfg = make_config(
        tmp_path, embedding=True, mfcc=True, num_skip_conn=1,
        resnet_units=(1, 1, 1, 1),
    )
    import dataclasses

    cfg = dataclasses.replace(
        cfg, parallel=dataclasses.replace(cfg.parallel, tensor_parallel=2)
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    trainer = Trainer(GenerationTask(cfg), cfg)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    for raw in loader.batches(0):
        break
    state = trainer.init_state(raw)

    def kernels(tree, pred):
        out = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            if pred(path, leaf):
                out.append((jax.tree_util.keystr(path), leaf))
        return out

    wide_conv = kernels(
        state.params,
        lambda p, l: l.ndim == 4 and l.shape[-1] >= 256 and l.shape[-1] % 2 == 0,
    )
    assert wide_conv  # the reduced trunk still has 256..2048-ch convs
    for name, leaf in wide_conv:
        assert leaf.sharding.spec == P(None, None, None, "model"), name
    dense_2d = kernels(state.params, lambda p, l: l.ndim == 2)
    assert dense_2d
    for name, leaf in dense_2d:
        assert leaf.sharding.spec == P(), name

    # The flagship's wide convs all sit in the FROZEN trunk
    # (set_to_zero carries no moments), so there are no wide Adam-moment
    # tensors to check here; the FSDP test covers moment-layout
    # inheritance and dryrun_multichip executes the TP step at depth.

    new_state, metrics = trainer.train_step(state, raw)
    wide_after = kernels(
        new_state.params, lambda p, l: l.ndim == 4 and l.shape[-1] >= 256
    )
    for name, leaf in wide_after:
        assert leaf.sharding.spec == P(None, None, None, "model"), name
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def test_spatial_sharding_spec():
    from jax.sharding import PartitionSpec as P

    from acoustic_image_generation_tpu.parallel import make_mesh, spatial_sharding

    mesh = make_mesh(8)
    assert spatial_sharding(mesh).spec == P(None, "data", None, None)
    mesh2 = make_mesh(8, model_parallel=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}


def test_host_sharded_rows_stitch_into_global_batch(tiny_dataset):
    """SPMD row-order contract of the host-sharded input pipeline: shard
    i's rows, placed on mesh slot i's devices, must reconstruct exactly
    the array form_global_batch produces from the full batch. (True
    multi-process assembly can't run in one process, so this validates
    the same placement with make_array_from_single_device_arrays.)"""
    import jax

    from acoustic_image_generation_tpu.parallel import (
        batch_sharding,
        form_global_batch,
        make_mesh,
    )

    mesh = make_mesh(2)
    n_shards = 2
    mk = lambda **kw: AcousticImageDataLoader(
        tiny_dataset["training"], "training", batch_size=8,
        sample_length=1, seed=0, **kw
    )
    global_batch = next(iter(mk().batches(0)))
    shard_batches = [
        next(iter(mk(shard_index=i, shard_count=n_shards).batches(0)))
        for i in range(n_shards)
    ]

    sharding = batch_sharding(mesh)
    devices = list(mesh.devices.flat)
    pieces = [
        jax.device_put(sb.acoustic, devices[i])
        for i, sb in enumerate(shard_batches)
    ]
    stitched = jax.make_array_from_single_device_arrays(
        global_batch.acoustic.shape, sharding, pieces
    )
    expected = form_global_batch(global_batch.acoustic, mesh)
    np.testing.assert_array_equal(
        np.asarray(stitched), np.asarray(expected)
    )
    assert stitched.sharding.is_equivalent_to(expected.sharding, stitched.ndim)


def test_host_sharded_cache_contract(tiny_dataset):
    """The contracts the multi-host cached step rests on
    (Trainer._train_step_with_cache, process_count>1 branch):

    1. host-sharded loaders' window_ids are GLOBAL indices — shard i's
       ids are exactly its contiguous row slice of the global batch's
       ids, so per-host cache keys agree with the shared window table;
    2. trainer._local_rows extracts a process's contiguous row block
       from a leading-axis-sharded global array (what the miss path
       persists into the host tier)."""
    import jax

    from acoustic_image_generation_tpu.parallel import (
        batch_sharding,
        make_mesh,
    )
    from acoustic_image_generation_tpu.train.trainer import _local_rows

    mk = lambda **kw: AcousticImageDataLoader(
        tiny_dataset["training"], "training", batch_size=8,
        sample_length=1, seed=0, **kw
    )
    global_ids = next(iter(mk().batches(0))).window_ids
    for i in range(2):
        shard = next(iter(mk(shard_index=i, shard_count=2).batches(0)))
        np.testing.assert_array_equal(
            shard.window_ids, global_ids[i * 4 : (i + 1) * 4]
        )

    mesh = make_mesh(2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    garr = jax.device_put(x, batch_sharding(mesh))
    # single process addresses every shard: _local_rows returns all rows
    np.testing.assert_array_equal(_local_rows(garr), x)
    # model-axis-replicated batch arrays collapse duplicate row blocks
    mesh2 = make_mesh(4, model_parallel=2)
    garr2 = jax.device_put(x, batch_sharding(mesh2))
    np.testing.assert_array_equal(_local_rows(garr2), x)


def test_disk_feature_store_roundtrip(tmp_path):
    """DiskFeatureStore (train/feature_cache.py): raw-bytes rows round-trip
    (incl. bfloat16), budget is honored and counts pre-existing files on
    reopen, and a geometry mismatch is refused rather than corrupting."""
    import ml_dtypes

    from acoustic_image_generation_tpu.train.feature_cache import DiskFeatureStore

    row = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    brow = row.astype(ml_dtypes.bfloat16)
    store = DiskFeatureStore(str(tmp_path), "abc123", max_bytes=3 * brow.nbytes)
    assert store.get(0) is None
    assert store.put(0, brow)
    assert 0 in store and store.get(0).dtype == brow.dtype
    np.testing.assert_array_equal(np.asarray(store.get(0)), np.asarray(brow))
    assert store.put(0, brow)  # idempotent re-put
    assert store.put(1, brow) and store.put(2, brow)
    assert not store.put(3, brow)  # budget exhausted
    assert not store.put(4, brow[:1])  # different shape refused
    # reopen: index + byte accounting rebuilt from disk
    store2 = DiskFeatureStore(str(tmp_path), "abc123", max_bytes=3 * brow.nbytes)
    assert len(store2) == 3 and store2.nbytes == 3 * brow.nbytes
    np.testing.assert_array_equal(np.asarray(store2.get(2)), np.asarray(brow))
    assert not store2.put(5, brow)  # still over budget after reopen
    # a different fingerprint is a different (empty) store
    other = DiskFeatureStore(str(tmp_path), "def456", max_bytes=1 << 20)
    assert 0 not in other and other.get(0) is None


def test_trunk_feature_cache_disk_writethrough(tmp_path):
    """TrunkFeatureCache with a disk tier: rows flow to disk even when the
    RAM budget is zero; RAM misses fall back to disk and promote."""
    from acoustic_image_generation_tpu.train.feature_cache import (
        DiskFeatureStore,
        TrunkFeatureCache,
    )

    disk = DiskFeatureStore(str(tmp_path), "fp", max_bytes=1 << 20)
    cache = TrunkFeatureCache(max_bytes=0, disk=disk)
    row = np.ones((2, 3), np.float32)
    assert cache.put(7, row)  # durable on disk despite ram budget 0
    assert 7 in cache and 7 in disk
    got = cache.get(7)
    np.testing.assert_array_equal(np.asarray(got), row)
    # ram=False (device-pool-resident row): disk only
    assert cache.put(8, row, ram=False)
    assert 8 in disk
    # with ram budget, a disk hit promotes into RAM
    cache2 = TrunkFeatureCache(max_bytes=1 << 20, disk=disk)
    assert cache2.get(7) is not None
    assert 7 in cache2._store


def test_disk_feature_tier_cross_run(tiny_dataset, tmp_path):
    """Cross-run reuse (ModelConfig.cache_disk_dir): a second Trainer with
    the same frozen trunk over the same windows is served entirely from
    the disk store — zero trunk invocations — with an identical loss; a
    different trunk (different seed) keys a different store."""
    import jax

    kw = dict(
        embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1),
        trunk_bn="frozen", cache_trunk_features=True, cache_device_bytes=0,
        cache_disk_dir=str(tmp_path / "feat"),
    )
    loader = AcousticImageDataLoader(tiny_dataset["training"], "training", 8)
    for raw in loader.batches(0):
        break

    cfg1 = make_config(tmp_path / "a", **kw)
    tr1 = Trainer(GenerationTask(cfg1), cfg1)
    s1 = tr1.init_state(raw)
    tr1._attach_disk(loader, s1, tr1.feature_cache)
    assert tr1.feature_cache.disk is not None
    s1, m1 = tr1.train_step(s1, raw)
    assert len(tr1.feature_cache.disk) == raw.valid

    cfg2 = make_config(tmp_path / "b", **kw)  # same seed -> same trunk
    tr2 = Trainer(GenerationTask(cfg2), cfg2)
    s2 = tr2.init_state(raw)
    tr2._attach_disk(loader, s2, tr2.feature_cache)
    assert tr2.feature_cache.disk.dir == tr1.feature_cache.disk.dir
    calls = 0
    orig = tr2._trunk_features

    def counting(*a, **k):
        nonlocal calls
        calls += 1
        return orig(*a, **k)

    tr2._trunk_features = counting
    s2, m2 = tr2.train_step(s2, raw)
    assert calls == 0, "second run must be served from the disk tier"
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)

    # a different trunk fingerprints a different store
    import dataclasses

    cfg3 = dataclasses.replace(
        cfg1, run=dataclasses.replace(cfg1.run, seed=5, checkpoint_dir=str(tmp_path / "c"))
    )
    tr3 = Trainer(GenerationTask(cfg3), cfg3)
    s3 = tr3.init_state(raw)
    tr3._attach_disk(loader, s3, tr3.feature_cache)
    assert tr3.feature_cache.disk.dir != tr1.feature_cache.disk.dir
    assert len(tr3.feature_cache.disk) == 0
