"""CLI flag surface: parse reference-style flag sets and check the trainer
dispatch matches main.py's (``/root/reference/main.py:175-240, 286-323``)."""

import pytest

from acoustic_image_generation_tpu.cli.main import (
    build_parser,
    config_from_args,
    select_task,
)


def parse(argv):
    return config_from_args(build_parser().parse_args(argv))


def test_flagship_generation_dispatch():
    cfg = parse(["--mode", "train", "--embedding", "1", "--mfcc", "1",
                 "--num_skip_conn", "2", "--ae", "1", "--latent_loss", "1e-5"])
    from acoustic_image_generation_tpu.train.generation import GenerationTask

    task = select_task(cfg)
    assert isinstance(task, GenerationTask)
    assert task.generator.skips == 2
    assert task.generator.embedding is True
    assert cfg.optim.latent_loss == pytest.approx(1e-5)


def test_embed_and_proxy_dispatch():
    from acoustic_image_generation_tpu.train.embed import EmbedTask

    assert isinstance(select_task(parse(["--embedding", "1"])), EmbedTask)
    task = select_task(parse(["--embedding", "1", "--proxy", "1"]))
    assert isinstance(task, EmbedTask) and task.cfg.model.proxy


def test_project_and_joint_dispatch():
    from acoustic_image_generation_tpu.train.joint import JointTask
    from acoustic_image_generation_tpu.train.project import ProjectTask

    assert isinstance(
        select_task(parse(["--embedding", "1", "--project", "1"])), ProjectTask
    )
    assert isinstance(
        select_task(parse(["--embedding", "1", "--jointmvae", "1", "--onlyaudiovideo", "1"])),
        JointTask,
    )


def test_reconstruct_and_classify_dispatch():
    from acoustic_image_generation_tpu.train.classify import (
        ClassificationTask,
        GeneratedClassificationTask,
    )
    from acoustic_image_generation_tpu.train.reconstruct import ReconstructTask

    assert isinstance(select_task(parse(["--model", "UNet", "--encoder_type", "Ac"])), ReconstructTask)
    assert isinstance(
        select_task(parse(["--model", "DualCamNet", "--mfcc", "1"])), ClassificationTask
    )
    assert isinstance(
        select_task(parse(["--model", "DualCamNet", "--mfcc", "0",
                           "--datatype", "old"])),
        GeneratedClassificationTask,
    )


def test_datatype_properties():
    cfg = parse(["--datatype", "music"])
    assert cfg.data.num_classes == 9
    assert cfg.data.num_channels == 13
    cfg = parse(["--datatype", "old"])
    assert cfg.data.num_classes == 14
    assert cfg.data.num_locations == 3


def test_config_roundtrip(tmp_path):
    from acoustic_image_generation_tpu.core.config import ExperimentConfig

    cfg = parse(["--embedding", "1", "--mfcc", "1", "--batch_size", "64",
                 "--compute_dtype", "bfloat16"])
    path = str(tmp_path / "configuration.txt")
    cfg.save(path)
    loaded = ExperimentConfig.load(path)
    assert loaded.data.batch_size == 64
    assert loaded.parallel.compute_dtype == "bfloat16"
    assert loaded.model.mfcc is True


@pytest.mark.slow
def test_cli_train_then_test_subprocess(tmp_path):
    """The reference workflow end-to-end through the real CLI entry point
    (scripts/test.bash protocol): `main --mode train` -> best epoch from
    model.txt -> `main --mode test --restore_checkpoint`."""
    import os
    import subprocess
    import sys

    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
    from acoustic_image_generation_tpu.train.checkpoint import BestTracker

    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    # without this the axon sitecustomize would re-pin the child to the
    # TPU tunnel (config update outranks JAX_PLATFORMS); see core/platform.py
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = [
        sys.executable, "-m", "acoustic_image_generation_tpu.cli.main",
        "--model", "UNet", "--encoder_type", "Ac", "--datatype", "outdoor",
        "--batch_size", "8", "--sample_length", "1", "--num_epochs", "1",
        "--learning_rate", "0.001", "--compute_dtype", "float32",
        "--exp_name", "cli_e2e", "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--train_file", lists["training"], "--valid_file", lists["validation"],
        "--test_file", lists["testing"],
    ]
    subprocess.run([*base, "--mode", "train"], check=True, cwd=repo, env=env,
                   timeout=1800)
    run_dir = tmp_path / "ckpt" / "cli_e2e"
    assert (run_dir / "model.txt").exists()
    assert (run_dir / "configuration.txt").exists()
    best = BestTracker.read_best_epoch(str(run_dir))
    ckpt = run_dir / f"epoch_{best}.ckpt"
    assert ckpt.exists()

    subprocess.run(
        [*base, "--mode", "test", "--restore_checkpoint", str(ckpt)],
        check=True, cwd=repo, env=env, timeout=1800,
    )
    assert (run_dir / "test_accuracy.txt").exists()


def test_correspondence_dispatch():
    from acoustic_image_generation_tpu.train.classify import CorrespondenceTask

    task = select_task(parse(["--model", "DualCamNet", "--correspondence", "1"]))
    assert isinstance(task, CorrespondenceTask)
    assert task.model.num_classes == 2


def test_host_shard_flag_reaches_loader(tmp_path):
    from acoustic_image_generation_tpu.cli.main import make_loader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset

    lists = write_synthetic_dataset(
        str(tmp_path), num_classes=2, videos_per_class=1, seconds_per_video=2
    )
    cfg = parse(["--mode", "train", "--train_file", lists["training"],
                 "--host_shard", "1", "--batch_size", "4"])
    assert cfg.data.host_shard
    loader = make_loader(cfg, "training")
    # single-process: identity sharding (index 0 of 1)
    assert (loader.shard_index, loader.shard_count) == (0, 1)
    assert loader.local_batch_size == 4


def test_bench_watchdog_forwards_child_metric():
    """bench.py's __main__ runs the measurement in a child process (the
    tunneled TPU can wedge one process permanently inside an RPC); the
    child's JSON metric line must be forwarded verbatim with exit 0."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, AIG_BENCH_SELFTEST="1")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr.decode()
    rec = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert rec["metric"] == "bench_selftest"
    assert rec["vs_baseline"] == 1.0


def test_bench_drives_production_trainer_step():
    """The train-mode measurement must execute the PRODUCTION step —
    train/trainer.py's jitted `_train_step_cached_impl` via the real
    Trainer (TF1-exact Adam, production `_prepare`) — not a hand-rolled
    twin (round-2 verdict weak #6). Runs bench.py in-process-child on a
    2-device virtual CPU mesh at tiny sizes: exercises Trainer
    construction, device_batch sharding, the cached-feature fill via
    `_trunk_features`, and the DP per-chip normalization."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # drop every inherited AIG_BENCH_* knob first: a contaminated shell
    # (e.g. AIG_BENCH_CACHE=0 or AIG_BENCH_MODE=ingest left over from a
    # manual run) would silently change which step this test pins
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("AIG_BENCH_")}
    env.update(
        AIG_BENCH_NO_WATCHDOG="1",
        AIG_BENCH_CPU_MESH="2",
        AIG_BENCH_CLIPS="1",  # per-chip: global batch = 2 on the 2-mesh
        AIG_BENCH_STEPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    rec = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert rec["metric"] == "generation_train_clips_per_sec_chip"
    assert rec["value"] > 0


def test_bench_task_probe_classify():
    """AIG_BENCH_TASK=classify must drive the DualCamNet family through
    the production Trainer step and emit its own metric name (the
    docs/PERF.md task-family rungs)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("AIG_BENCH_")}
    env.update(
        AIG_BENCH_NO_WATCHDOG="1",
        AIG_BENCH_CPU_MESH="1",
        AIG_BENCH_DP="0",
        AIG_BENCH_TASK="classify",
        AIG_BENCH_CLIPS="2",
        AIG_BENCH_STEPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    rec = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert rec["metric"] == "classify_train_clips_per_sec_chip"
    assert rec["value"] > 0


def test_bench_watchdog_kills_wedged_child():
    """A child that produces no metric within AIG_BENCH_TIMEOUT is killed
    and the run fails loudly (exit 1) instead of hanging the driver."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("AIG_BENCH_")}
    env.update(AIG_BENCH_ATTEMPTS="1", AIG_BENCH_TIMEOUT="1")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, timeout=120,
    )
    assert out.returncode == 1
    assert b"no result within" in out.stderr
