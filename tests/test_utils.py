"""Logger / plots / stats utilities."""

import json
import os

import numpy as np
import pytest

from acoustic_image_generation_tpu.data.stats import (
    compute_spectrogram_stats,
    load_stats,
    normalize_spectrogram,
    save_stats,
)
from acoustic_image_generation_tpu.evaluation.overlay import save_overlay_grid
from acoustic_image_generation_tpu.evaluation.plots import save_channel_grid
from acoustic_image_generation_tpu.utils.logger import Logger
from acoustic_image_generation_tpu.utils.profiling import StepTimer


def test_logger_scalars_images_audio(tmp_path):
    log = Logger(str(tmp_path))
    log.log_scalar("loss", 0.5, step=1)
    log.log_scalars({"mse": 0.1, "huber": 0.2}, step=2)
    log.log_histogram("weights", np.random.default_rng(0).normal(size=100), step=2)
    img_path = log.log_image("recon", np.random.default_rng(1).random((36, 48)), step=3, cmap="viridis")
    wav_path = log.log_sound("mic", np.sin(np.linspace(0, 100, 12288)), step=3)
    assert os.path.exists(img_path) and os.path.exists(wav_path)
    records = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert any("loss" in r for r in records)
    assert any("weights/mean" in r for r in records)


def test_channel_grid_and_overlay(tmp_path):
    rng = np.random.default_rng(0)
    real = rng.random((36, 48, 12)).astype(np.float32)
    gen = rng.random((36, 48, 12)).astype(np.float32)
    p1 = save_channel_grid(str(tmp_path / "grid.png"), real, gen)
    p2 = save_overlay_grid(
        str(tmp_path / "overlay.png"),
        rng.random((224, 298, 3)).astype(np.float32),
        rng.random((36, 48)) > 0.5,
        rng.random((36, 48)) > 0.5,
    )
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_spectrogram_stats_roundtrip(tmp_path):
    from acoustic_image_generation_tpu.data.pipeline import RawBatch

    rng = np.random.default_rng(2)

    class FakeLoader:
        def batches(self, epoch):
            for s in range(2):
                yield RawBatch(
                    acoustic=np.zeros((2, 12, 36, 48, 12), np.float32),
                    audio=rng.integers(-3000, 3000, (2, 12, 1024)).astype(np.int32),
                    video=np.zeros((2, 12, 2, 2, 3), np.uint8),
                    action=np.zeros(2, np.int32),
                    location=np.zeros(2, np.int32),
                    valid=2,
                )

    mean, std = compute_spectrogram_stats(FakeLoader())
    assert mean.shape == (99, 257) and std.shape == (99, 257)
    assert np.all(std > 0)
    save_stats(str(tmp_path / "stats2s"), mean, std)
    m2, s2 = load_stats(str(tmp_path / "stats2s"))
    np.testing.assert_array_equal(mean, m2)
    import jax.numpy as jnp

    z = normalize_spectrogram(jnp.asarray(np.ones((1, 99, 257), np.float32)), m2, s2)
    assert np.isfinite(np.asarray(z)).all()


def test_step_timer():
    t = StepTimer(clips_per_step=8, warmup=1)
    for _ in range(3):
        t.step()
    assert t.steps_timed == 2
    assert t.clips_per_sec >= 0


def test_embed_task_spectrogram_znorm(tmp_path):
    """normalize_spectrogram wiring: EmbedTask loads stats2s and applies
    z-norm to its per-second spectrograms."""
    import jax.numpy as jnp

    from acoustic_image_generation_tpu.core.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )
    from acoustic_image_generation_tpu.train.embed import EmbedTask

    mean = np.full((99, 257), 2.0, np.float32)
    std = np.full((99, 257), 4.0, np.float32)
    save_stats(str(tmp_path / "stats2s"), mean, std)
    cfg = ExperimentConfig(
        data=DataConfig(
            normalize_spectrogram=True, stats_dir=str(tmp_path / "stats2s")
        ),
        model=ModelConfig(embedding=True, num_class=150),
    )
    task = EmbedTask(cfg)
    assert task.spec_stats is not None

    from acoustic_image_generation_tpu.data.preprocess import Batch

    n = 12
    rng2 = np.random.default_rng(1)
    batch = Batch(
        acoustic=jnp.zeros((n, 36, 48, 12)),
        audio=jnp.asarray(rng2.normal(0, 100, (n, 1024)).astype(np.float32)),
        mfcc=jnp.zeros((n, 12)),
        video=jnp.zeros((n, 224, 298, 3)),
        action=jnp.zeros((n,), jnp.int32),
        location=jnp.zeros((n,), jnp.int32),
        filtered_mfcc=jnp.zeros((n, 12)),
    )
    _, spec_norm, _ = task._inputs(batch)
    cfg_raw = ExperimentConfig(model=ModelConfig(embedding=True, num_class=150))
    spec_raw = EmbedTask(cfg_raw)._inputs(batch)[1]
    # z-norm: (x - 2) / 4 applied before the resize
    np.testing.assert_allclose(
        np.asarray(spec_norm), (np.asarray(spec_raw) - 2.0) / 4.0, rtol=1e-4, atol=1e-5
    )


def test_overlay_video_frames(tmp_path):
    from acoustic_image_generation_tpu.evaluation.overlay import (
        save_overlay_video_frames,
    )

    rng2 = np.random.default_rng(3)
    frames = rng2.random((3, 224, 298, 3)).astype(np.float32)
    masks = rng2.random((3, 36, 48)) > 0.5
    paths = save_overlay_video_frames(str(tmp_path / "vid"), frames, masks)
    assert len(paths) == 3 and all(os.path.getsize(p) > 500 for p in paths)


def test_sweep_parses_test_accuracy_lines():
    """sweep.py reads each seed's test_accuracy.txt (the exact format
    Trainer.test writes, mirroring mfcctrainer.py:527-534) and feeds the
    floats to the 5-seed trimmed aggregation."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "sweep", os.path.join(os.path.dirname(__file__), "..", "scripts", "sweep.py")
    )
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    line = ("2026-08-16 12:00:00.000: acres_seed0 - huber: 0.001200 - "
            "loss: 0.004500 - mse: 0.003300 - mse0: 0.003100\n")
    got = sweep.parse_test_accuracy(line)
    assert got == {
        "huber": 0.0012, "loss": 0.0045, "mse": 0.0033, "mse0": 0.0031,
    }

    # the sweep defaults the cross-run disk feature tier on when trunk
    # caching is requested (every seed shares the same frozen trunk), and
    # never overrides an explicit store or an uncached run
    store = os.path.join("ckpt", "_feature_store")
    assert sweep.default_disk_store(
        ["--cache_trunk_features", "1"], "ckpt"
    ) == ["--cache_trunk_features", "1", "--cache_disk_dir", store]
    assert sweep.default_disk_store(
        ["--cache_trunk_features", "0"], "ckpt"
    ) == ["--cache_trunk_features", "0"]
    assert sweep.default_disk_store([], "ckpt") == []
    explicit = ["--cache_trunk_features", "1", "--cache_disk_dir", "/mine"]
    assert sweep.default_disk_store(explicit, "ckpt") == explicit


def test_xlsx_writer_roundtrip(tmp_path):
    """utils.xlsx: dependency-free workbook writer (meanstd.py's artifact
    format) round-trips text and numeric cells."""
    from acoustic_image_generation_tpu.utils.xlsx import read_xlsx_rows, write_xlsx

    rows = [["metric", "mean", "std", "n"],
            ["accuracy", 0.912, 0.013, 5],
            ["iou@0.5", 0.5, 0.0, 3]]
    path = write_xlsx(str(tmp_path / "agg.xlsx"), rows)
    got = read_xlsx_rows(path)
    assert got[0] == rows[0]
    assert got[1][0] == "accuracy" and abs(got[1][1] - 0.912) < 1e-12
    assert got[2][3] == 3
    # it is a real zip-of-xml workbook
    import zipfile

    assert zipfile.is_zipfile(path)
    with zipfile.ZipFile(path) as z:
        assert "xl/workbook.xml" in z.namelist()


def test_aggregate_runs_xlsx_artifact(tmp_path):
    """aggregate_runs writes the reference-style xlsx when asked
    (meanstd.py:150-163)."""
    from acoustic_image_generation_tpu.evaluation.aggregate import aggregate_runs
    from acoustic_image_generation_tpu.utils.xlsx import read_xlsx_rows

    out = str(tmp_path / "meanstd.xlsx")
    res = aggregate_runs({"acc": [1.0, 2.0, 3.0, 4.0, 5.0]}, out)
    assert res["acc"]["mean"] == 3.0  # trimmed: drop 1 and 5
    rows = read_xlsx_rows(out)
    assert rows[0] == ["metric", "mean", "std", "n"]
    assert rows[1][0] == "acc" and rows[1][1] == 3.0 and rows[1][3] == 5


def test_profiler_op_stats_parses_device_trace(tmp_path):
    """op_stats() aggregation math on a synthetic xprof TraceViewer
    capture (utils/profiling.py): per-step normalization, category
    sort/pct/gbps, top-op long names, and the accelerator-over-host lane
    preference. Synthetic because only a real accelerator emits an
    "XLA Ops" lane — the CPU backend's traces have host threads only, so
    the suite cannot capture one (the live path is covered by the
    AIG_FULL_TESTS test below, on the actual chip)."""
    import gzip
    import json
    import os

    from acoustic_image_generation_tpu.utils import profiling

    events = [
        # host process with its own (busier) op lane: must NOT be picked
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 10,
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 1, "tid": 10, "name": "host.op", "dur": 99000,
         "args": {"hlo_category": "other"}},
        # accelerator process + XLA Ops lane
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "thread_name", "pid": 2, "tid": 20,
         "args": {"name": "XLA Ops"}},
        # dur is in microseconds; two steps' worth of each op
        {"ph": "X", "pid": 2, "tid": 20, "name": "conv.2", "dur": 12000,
         "args": {"hlo_category": "convolution",
                  "bytes_accessed": "24000000000",
                  "long_name": "%conv.2 = f32[64,112,112,64] convolution(...)"}},
        {"ph": "X", "pid": 2, "tid": 20, "name": "fusion.1", "dur": 4000,
         "args": {"hlo_category": "loop fusion",
                  "bytes_accessed": "8000000000",
                  "long_name": "%fusion.1 = fused_computation(...)"}},
    ]
    d = str(tmp_path / "trace")
    cap = os.path.join(d, "plugins", "profile", "2026_01_01_00_00_00")
    os.makedirs(cap)
    with gzip.open(os.path.join(cap, "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)

    s = profiling.op_stats(d, steps=2, top=5)
    # device lane chosen over the busier host lane; per-step normalized
    assert s["total_ms"] == 8.0
    conv, fus = s["by_category"]
    assert conv == {"category": "convolution", "ms": 6.0, "pct": 75.0,
                    "gb_accessed": 12.0, "gbps": 2000.0}
    assert fus["category"] == "loop fusion" and fus["ms"] == 2.0
    assert s["top_ops"][0]["op"] == "conv.2"
    assert s["top_ops"][0]["long_name"].startswith("%conv.2")
    assert all(op["long_name"] for op in s["top_ops"])


@pytest.mark.skipif(
    os.environ.get("AIG_FULL_TESTS") != "1",
    reason="live xprof capture needs a real accelerator (the CPU backend "
    "emits no XLA Ops lane); run with AIG_FULL_TESTS=1 on a chip host",
)
def test_profiler_op_stats_live_capture(tmp_path):
    """trace() -> op_stats() end to end on the real device: the capture
    has a device op lane with per-category times/bytes and named ops."""
    import subprocess
    import sys

    from acoustic_image_generation_tpu.utils import profiling

    d = str(tmp_path / "trace")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)  # whatever accelerator the host pins
    prog = (
        "import jax, jax.numpy as jnp\n"
        "from acoustic_image_generation_tpu.utils import profiling\n"
        "f = jax.jit(lambda x: (x @ x).sum())\n"
        "x = jnp.ones((256, 256))\n"
        "float(f(x))\n"
        f"d = {d!r}\n"
        "with profiling.trace(d):\n"
        "    [float(f(x)) for _ in range(4)]\n"
    )
    subprocess.run([sys.executable, "-c", prog], env=env, check=True, timeout=600)
    s = profiling.op_stats(d, steps=4, top=5)
    assert s["total_ms"] >= 0 and s["by_category"] and s["top_ops"]
    row = s["by_category"][0]
    assert {"category", "ms", "pct", "gb_accessed", "gbps"} <= set(row)
    assert all(op["long_name"] for op in s["top_ops"])


def test_tb_event_file_roundtrips_through_tf(tmp_path):
    """The Logger's events.out.tfevents.* mirror (utils/tb_events.py, no
    TF dependency) is read back by the REAL TensorFlow summary reader:
    masked-CRC record framing, Event/Summary wire format, scalar floats,
    full histograms, PNG image geometry, and WAV audio payloads all
    match what tf.summary.FileWriter would have produced
    (/root/reference/logger/logger.py)."""
    import glob

    import pytest

    tf = pytest.importorskip("tensorflow")

    rng = np.random.default_rng(0)
    log = Logger(str(tmp_path))
    log.log_scalar("loss", 0.5, step=1)
    log.log_scalars({"valid/mse": 1.0, "valid/kl": 2.0}, step=2)
    log.log_histogram("weights", rng.normal(size=100), step=3)
    log.log_image("recon", rng.random((8, 6, 3)).astype(np.float32), step=4)
    log.log_sound("mic", rng.normal(size=256).astype(np.float32), step=5)
    log.close()

    paths = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(paths) == 1
    events = list(tf.compat.v1.train.summary_iterator(paths[0]))
    assert events[0].file_version == "brain.Event:2"
    by_step: dict = {}
    for e in events[1:]:
        for v in e.summary.value:
            by_step.setdefault(e.step, {})[v.tag] = v

    assert by_step[1]["loss"].simple_value == 0.5
    assert by_step[2]["valid/mse"].simple_value == 1.0
    assert by_step[2]["valid/kl"].simple_value == 2.0

    h = by_step[3]["weights"].histo
    assert h.num == 100.0
    assert sum(h.bucket) == 100.0
    assert len(h.bucket_limit) == len(h.bucket) == 30
    assert h.min <= h.bucket_limit[0] and h.max == h.bucket_limit[-1]

    im = by_step[4]["recon"].image
    assert (im.height, im.width) == (8, 6)
    decoded = tf.io.decode_png(im.encoded_image_string).numpy()
    assert decoded.shape[:2] == (8, 6)

    au = by_step[5]["mic"].audio
    assert au.sample_rate == 12288.0
    assert au.num_channels == 1 and au.length_frames == 256
    with open(os.path.join(str(tmp_path), "media", "mic_5.wav"), "rb") as f:
        assert au.encoded_audio_string == f.read()
