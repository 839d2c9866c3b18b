"""End-to-end localization evaluation: energy-IoU sweep over a generation
checkpoint and box-IoU sweep over Flickr-shaped shards (SURVEY.md §3.4)."""

import json
import os

import jax
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
from acoustic_image_generation_tpu.data.synthetic import (
    write_flickr_dataset,
    write_synthetic_dataset,
)
from acoustic_image_generation_tpu.evaluation.localize import run_iou_sweep
from acoustic_image_generation_tpu.evaluation.localize_boxes import run_box_iou_sweep
from acoustic_image_generation_tpu.train.generation import GenerationTask
from acoustic_image_generation_tpu.train.trainer import Trainer


def make_cfg(tmp_path):
    return ExperimentConfig(
        data=DataConfig(batch_size=8, sample_length=1),
        model=ModelConfig(embedding=True, mfcc=True, resnet_units=(1, 1, 1, 1)),
        optim=OptimConfig(num_epochs=1),
        run=RunConfig(exp_name="loc", checkpoint_dir=str(tmp_path)),
        parallel=ParallelConfig(compute_dtype="float32"),
    )


@pytest.mark.slow
def test_energy_iou_sweep_writes_reference_artifacts(tmp_path):
    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    cfg = make_cfg(tmp_path)
    loader = AcousticImageDataLoader(lists["testing"], "testing", 8)
    task = GenerationTask(cfg)
    trainer = Trainer(task, cfg)
    for first in loader.batches(0):
        break
    # host copy: the sweep runners run single-device jit over the raw batch
    state = jax.device_get(trainer.init_state(first))

    out_dir = str(tmp_path / "iou")
    res = run_iou_sweep(task, state, loader, out_dir)
    assert res["iou"].shape[0] == 8 * 12  # every frame scored
    assert np.all((res["iou"] >= 0) & (res["iou"] <= 1))
    assert 0.0 <= res["auc"] <= 1.0
    # reference artifact files, one per threshold + area.txt
    assert os.path.exists(os.path.join(out_dir, "intersection_0.5_accuracy.txt"))
    assert os.path.exists(os.path.join(out_dir, "area.txt"))
    # fractions are monotonically non-increasing in the threshold
    ts = sorted(res["fractions"])
    fr = [res["fractions"][t] for t in ts]
    assert all(a >= b for a, b in zip(fr, fr[1:]))


@pytest.mark.slow
def test_box_iou_sweep_flickr(tmp_path):
    lists = write_flickr_dataset(str(tmp_path / "flickr"), num_videos=4, seconds_per_video=2)
    cfg = make_cfg(tmp_path)
    loader = AcousticImageDataLoader(
        lists["testing"], "testing", 8, include_boxes=True, drop_remainder=False
    )
    task = GenerationTask(cfg)
    trainer = Trainer(task, cfg)
    for first in loader.batches(0):
        break
    assert first.extras is not None and first.extras["xmax"].max() > 0
    state = jax.device_get(trainer.init_state(first))
    res = run_box_iou_sweep(task, state, loader, str(tmp_path / "bb"))
    assert res["iou"].shape[0] == 8 * 12
    assert np.all(np.isfinite(res["iou"]))
    assert os.path.exists(os.path.join(str(tmp_path / "bb"), "area.txt"))


@pytest.mark.slow
def test_real_vs_generated_accuracy(tmp_path):
    """saveimagesresnet.py capability: one pass scoring a DualCamNet on
    both real and generated acoustic images."""
    from acoustic_image_generation_tpu.evaluation.real_vs_generated import (
        real_vs_generated_accuracy,
    )
    from acoustic_image_generation_tpu.train.classify import ClassificationTask

    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    cfg = make_cfg(tmp_path)
    loader = AcousticImageDataLoader(lists["testing"], "testing", 8)
    gen_task = GenerationTask(cfg)
    trainer = Trainer(gen_task, cfg)
    for first in loader.batches(0):
        break
    gen_state = jax.device_get(trainer.init_state(first))

    cls_task = ClassificationTask(cfg)
    cls_trainer = Trainer(cls_task, cfg)
    cls_state = jax.device_get(cls_trainer.init_state(first))

    res = real_vs_generated_accuracy(
        gen_task, gen_state, cls_task, cls_state.params["dualcamnet"], loader
    )
    assert res["n"] == 8
    assert 0.0 <= res["real_accuracy"] <= 1.0
    assert 0.0 <= res["generated_accuracy"] <= 1.0


@pytest.mark.slow
def test_tools_generate_serving_cli(tmp_path):
    """Serving surface: `tools generate` loads a generator checkpoint and
    batch-generates acoustic images (+ inverted energy maps) from
    (mfcc, video) only."""
    import jax

    from acoustic_image_generation_tpu.cli import tools
    from acoustic_image_generation_tpu.cli.main import (
        build_parser,
        config_from_args,
    )
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
    from acoustic_image_generation_tpu.train import checkpoint as ckpt_mod
    from acoustic_image_generation_tpu.train.generation import GenerationTask
    from acoustic_image_generation_tpu.train.trainer import Trainer

    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=2, videos_per_class=2, seconds_per_video=1
    )
    flags = [
        "--embedding", "1", "--mfcc", "1", "--resnet_units", "1,1,1,1",
        "--batch_size", "8", "--sample_length", "1", "--compute_dtype", "float32",
        "--exp_name", "gen_cli", "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--test_file", lists["testing"],
    ]
    cfg = config_from_args(build_parser().parse_args(flags))
    assert cfg.model.resnet_units == (1, 1, 1, 1)
    trainer = Trainer(GenerationTask(cfg), cfg)
    loader = AcousticImageDataLoader(lists["testing"], "testing", 8)
    for first in loader.batches(0):
        break
    state = trainer.init_state(first)
    path = ckpt_mod.save_checkpoint(str(tmp_path), "init", state)

    out_dir = tmp_path / "served"
    rc = tools.main([
        "generate", "--set", "testing", "--energy", path, str(out_dir), "--", *flags,
    ])
    assert rc == 0
    gen = np.load(out_dir / "testing_generated.npy")
    energy = np.load(out_dir / "testing_energy.npy")
    labels = np.load(out_dir / "testing_labels.npy")
    n = loader.num_windows * 12
    assert gen.shape == (n, 36, 48, 12)
    assert energy.shape == (n, 36, 48)
    assert labels.shape == (n,)
    assert np.isfinite(gen).all() and np.isfinite(energy).all()
    assert gen.min() >= 0.0 and gen.max() <= 1.0

    # int8 frozen trunk in the serving path (--trunk_quant flows through
    # --train_flags; cmd_generate calibrates qtrunk from the first batch).
    # Compiling the second serve program costs ~10 min on a 1-core CI
    # host, so the variant stays behind AIG_FULL_TESTS (quant math itself
    # is covered by tests/test_quant.py).
    if not os.environ.get("AIG_FULL_TESTS"):
        return
    out_q = tmp_path / "served_int8"
    rc = tools.main([
        "generate", "--set", "testing", path, str(out_q), "--",
        *flags, "--trunk_bn", "frozen", "--trunk_quant", "int8",
    ])
    assert rc == 0
    gen_q = np.load(out_q / "testing_generated.npy")
    assert gen_q.shape == (n, 36, 48, 12)
    assert np.isfinite(gen_q).all()
    assert gen_q.min() >= 0.0 and gen_q.max() <= 1.0


@pytest.mark.slow
def test_tools_export_serving_cli(tmp_path):
    """Deployment surface: `tools export-serving` writes a StableHLO
    artifact and `tools generate --artifact` serves from it — loader in,
    baked module forward, npy artifacts out (core/serving.py)."""
    from acoustic_image_generation_tpu.cli import tools
    from acoustic_image_generation_tpu.cli.main import (
        build_parser,
        config_from_args,
    )
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
    from acoustic_image_generation_tpu.train import checkpoint as ckpt_mod
    from acoustic_image_generation_tpu.train.generation import GenerationTask
    from acoustic_image_generation_tpu.train.trainer import Trainer

    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    flags = [
        "--embedding", "1", "--mfcc", "1", "--resnet_units", "1,1,1,1",
        "--batch_size", "8", "--sample_length", "1", "--compute_dtype", "float32",
        "--exp_name", "srv_cli", "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--train_file", lists["training"], "--test_file", lists["testing"],
    ]
    cfg = config_from_args(build_parser().parse_args(flags))
    trainer = Trainer(GenerationTask(cfg), cfg)
    loader = AcousticImageDataLoader(lists["training"], "training", 8)
    for first in loader.batches(0):
        break
    state = trainer.init_state(first)
    path = ckpt_mod.save_checkpoint(str(tmp_path), "init", state)

    art_dir = tmp_path / "artifact"
    rc = tools.main([
        "export-serving", "--energy", "--platforms", "cpu",
        path, str(art_dir), "--", *flags,
    ])
    assert rc == 0
    assert (art_dir / "module.stablehlo").exists()
    with open(art_dir / "manifest.json") as f:
        manifest = json.load(f)
    assert manifest["energy"] is True and manifest["batch"] == "poly"

    out_dir = tmp_path / "served_art"
    rc = tools.main([
        "generate", "--set", "testing", "--energy", "--artifact", str(art_dir),
        path, str(out_dir), "--", *flags,
    ])
    assert rc == 0
    test_loader = AcousticImageDataLoader(lists["testing"], "testing", 8)
    n = test_loader.num_windows * 12
    gen = np.load(out_dir / "testing_generated.npy")
    energy = np.load(out_dir / "testing_energy.npy")
    assert gen.shape == (n, 36, 48, 12) and energy.shape == (n, 36, 48)
    assert np.isfinite(gen).all() and np.isfinite(energy).all()
    assert gen.min() >= 0.0 and gen.max() <= 1.0


@pytest.mark.slow
def test_show_video_folder_renderer(tmp_path):
    """showvideo.py:201-233 driver: loader -> generation -> find_logen ->
    per-frame I_{:06d}.png overlays."""
    from acoustic_image_generation_tpu.evaluation.show_video import (
        render_video_overlays,
    )

    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    cfg = make_cfg(tmp_path)
    loader = AcousticImageDataLoader(lists["testing"], "testing", 8, drop_remainder=False)
    task = GenerationTask(cfg)
    trainer = Trainer(task, cfg)
    for first in loader.batches(0):
        break
    state = jax.device_get(trainer.init_state(first))
    paths = render_video_overlays(task, state, loader, str(tmp_path / "frames"))
    # every real frame rendered, numbered from I_000001
    assert len(paths) == loader.num_windows * 12
    assert os.path.basename(paths[0]) == "I_000001.png"
    assert all(os.path.exists(p) for p in paths)
