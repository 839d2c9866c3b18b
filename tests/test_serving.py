"""StableHLO serving artifacts (core/serving.py): export -> reload ->
forward parity vs the in-process generator, shape-polymorphic batch,
manifest/version gating. The reference has no serving layer (SURVEY.md
§1); this is the TPU build's deployment surface, so the contract tests
live here rather than in an integration suite."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acoustic_image_generation_tpu.core import serving
from acoustic_image_generation_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    ParallelConfig,
    RunConfig,
)
from acoustic_image_generation_tpu.data.preprocess import Batch
from acoustic_image_generation_tpu.train.generation import GenerationTask


class _State:
    def __init__(self, params, batch_stats):
        self.params = params
        self.batch_stats = batch_stats


@pytest.fixture(scope="module")
def tiny_flagship(tmp_path_factory):
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, sample_length=1),
        model=ModelConfig(
            embedding=True, mfcc=True, num_skip_conn=1, resnet_units=(1, 1, 1, 1)
        ),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
        run=RunConfig(
            exp_name="serve",
            checkpoint_dir=str(tmp_path_factory.mktemp("serve_ckpt")),
            seed=0,
        ),
        parallel=ParallelConfig(compute_dtype="float32"),
    )
    task = GenerationTask(cfg)
    rs = np.random.RandomState(0)
    mfcc = rs.rand(4, 12).astype(np.float32)
    video = rs.rand(4, 224, 298, 3).astype(np.float32)
    batch = Batch(
        acoustic=jnp.zeros((4, 36, 48, 12)),
        audio=jnp.zeros((4, 1024)),
        mfcc=mfcc,
        video=video,
        action=jnp.zeros((4,), jnp.int32),
        location=jnp.zeros((4,), jnp.int32),
        filtered_mfcc=jnp.zeros_like(mfcc),
    )
    params, batch_stats = task.init_variables(jax.random.key(0), batch)
    art_dir = str(tmp_path_factory.mktemp("artifact"))
    manifest = serving.export_generation(
        task, _State(params, batch_stats), art_dir, energy=True
    )
    return dict(
        task=task,
        params=params,
        batch_stats=batch_stats,
        mfcc=mfcc,
        video=video,
        art_dir=art_dir,
        manifest=manifest,
    )


@pytest.mark.slow
def test_artifact_matches_in_process_generate(tiny_flagship):
    t = tiny_flagship
    model = serving.load_artifact(t["art_dir"])
    gen, energy = model.generate(t["mfcc"], t["video"], seed=7)
    ref = np.asarray(
        t["task"].generate(
            t["params"], t["batch_stats"], t["mfcc"], t["video"],
            jax.random.key(np.int32(7)),
        )
    )
    assert gen.shape == (4, 36, 48, 12)
    assert energy.shape == (4, 36, 48)
    np.testing.assert_allclose(gen, ref, rtol=0, atol=5e-6)
    # seeds change the sampled latent -> different images
    gen2, _ = model.generate(t["mfcc"], t["video"], seed=8)
    assert np.max(np.abs(gen2 - gen)) > 0


@pytest.mark.slow
def test_artifact_batch_is_polymorphic(tiny_flagship):
    t = tiny_flagship
    model = serving.load_artifact(t["art_dir"])
    gen, energy = model.generate(t["mfcc"][:2], t["video"][:2], seed=7)
    assert gen.shape == (2, 36, 48, 12)
    full, _ = model.generate(t["mfcc"], t["video"], seed=7)
    # per-row latents key off the fold of one seed across the batch: the
    # leading rows of a larger batch are NOT required to match, but both
    # must be finite and in the sigmoid range
    assert np.isfinite(gen).all() and (gen >= 0).all() and (gen <= 1).all()
    assert np.isfinite(full).all()


@pytest.mark.slow
def test_manifest_records_contract(tiny_flagship):
    t = tiny_flagship
    with open(os.path.join(t["art_dir"], "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["format"] == serving.FORMAT
    assert manifest["batch"] == "poly"
    assert manifest["energy"] is True
    assert manifest["channels"] == 12
    assert manifest["trunk_quant"] == "none"
    assert set(manifest["platforms"]) >= {"cpu"}
    assert len(manifest["weights_sha256"]) == 64
    blob = os.path.getsize(os.path.join(t["art_dir"], "module.stablehlo"))
    assert blob == manifest["module_bytes"] > 0


@pytest.mark.slow
def test_classification_artifact_matches_in_process(tmp_path):
    """DualCamNet classifier artifact: per-frame acoustic images in,
    per-clip logits out, parity vs the in-process task._logits."""
    from acoustic_image_generation_tpu.train.classify import ClassificationTask

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, sample_length=1),
        model=ModelConfig(model="DualCamNet", mfcc=True),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
        run=RunConfig(exp_name="cls", checkpoint_dir=str(tmp_path), seed=0),
        parallel=ParallelConfig(compute_dtype="float32"),
    )
    task = ClassificationTask(cfg)
    rs = np.random.RandomState(1)
    acoustic = rs.rand(4 * 12, 36, 48, 12).astype(np.float32)
    batch = Batch(
        acoustic=acoustic,
        audio=jnp.zeros((48, 1024)),
        mfcc=jnp.zeros((48, 12)),
        video=jnp.zeros((48, 1, 1, 3)),
        action=jnp.zeros((48,), jnp.int32),
        location=jnp.zeros((48,), jnp.int32),
        filtered_mfcc=jnp.zeros((48, 12)),
    )
    params, _ = task.init_variables(jax.random.key(0), batch)
    art = str(tmp_path / "cls_art")
    manifest = serving.export_classification(task, _State(params, {}), art)
    assert manifest["kind"] == "classification"
    assert manifest["num_classes"] == 10 and manifest["num_frames"] == 12

    model = serving.load_artifact(art)
    logits = model.classify(acoustic)
    ref = np.asarray(task._logits(params, batch))
    assert logits.shape == (4, 10)
    np.testing.assert_allclose(logits, ref, rtol=0, atol=5e-5)
    # polymorphic clip count
    half = model.classify(acoustic[: 2 * 12])
    assert half.shape == (2, 10)
    # a generation call on a classification artifact must refuse
    with pytest.raises(ValueError, match="no generate"):
        model.generate(np.zeros((1, 12)), np.zeros((1, 224, 298, 3)))


@pytest.mark.slow
def test_classification_artifact_mfccmap_variant(tmp_path):
    """mfccmap classifiers (trainer_class.py:39-45 tiled-mfcc input) take
    (N*F,12) vectors; the artifact records and enforces that signature."""
    from acoustic_image_generation_tpu.train.classify import ClassificationTask

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=2, sample_length=1),
        model=ModelConfig(model="DualCamNet", mfcc=True, mfccmap=True),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
        run=RunConfig(exp_name="clsm", checkpoint_dir=str(tmp_path), seed=0),
        parallel=ParallelConfig(compute_dtype="float32"),
    )
    task = ClassificationTask(cfg)
    rs = np.random.RandomState(2)
    mfcc = rs.rand(24, 12).astype(np.float32)
    batch = Batch(
        acoustic=jnp.zeros((24, 36, 48, 12)),
        audio=jnp.zeros((24, 1024)),
        mfcc=mfcc,
        video=jnp.zeros((24, 1, 1, 3)),
        action=jnp.zeros((24,), jnp.int32),
        location=jnp.zeros((24,), jnp.int32),
        filtered_mfcc=jnp.zeros((24, 12)),
    )
    params, _ = task.init_variables(jax.random.key(0), batch)
    art = str(tmp_path / "art")
    manifest = serving.export_classification(task, _State(params, {}), art)
    assert manifest["mfccmap"] is True
    assert "mfcc" in manifest["inputs"]
    model = serving.load_artifact(art)
    logits = model.classify(mfcc)
    ref = np.asarray(task._logits(params, batch))
    assert logits.shape == (2, 10)
    np.testing.assert_allclose(logits, ref, rtol=0, atol=5e-5)


@pytest.mark.slow
def test_spatially_sharded_artifact_matches_replicated(tiny_flagship, tmp_path):
    """spatial_shards=8 bakes the spatial-serving layout (video height
    split + GSPMD halo exchanges, parallel.spatial_sharding semantics)
    into the module; serving it on the 8-device mesh must match the
    1-device artifact's output."""
    t = tiny_flagship
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    art = str(tmp_path / "sharded")
    manifest = serving.export_generation(
        t["task"],
        _State(t["params"], t["batch_stats"]),
        art,
        energy=False,
        platforms=("cpu",),
        spatial_shards=8,
    )
    assert manifest["spatial_shards"] == 8
    model = serving.load_artifact(art)
    gen = model.generate(t["mfcc"], t["video"], seed=7)
    ref = np.asarray(
        t["task"].generate(
            t["params"], t["batch_stats"], t["mfcc"], t["video"],
            jax.random.key(np.int32(7)),
        )
    )
    np.testing.assert_allclose(gen, ref, rtol=0, atol=5e-5)


@pytest.mark.slow
def test_embedding_artifact_matches_in_process(tmp_path):
    """3-VAE embedding artifact: one second per modality in, three
    aligned latents out, parity vs task.embeddings (the deployment
    counterpart of extract_triplet.py -> knn/retrieve)."""
    from acoustic_image_generation_tpu.train.embed import EmbedTask

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=2, sample_length=1),
        model=ModelConfig(embedding=True),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
        run=RunConfig(exp_name="emb", checkpoint_dir=str(tmp_path), seed=0),
        parallel=ParallelConfig(compute_dtype="float32"),
    )
    task = EmbedTask(cfg)
    rs = np.random.RandomState(3)
    acoustic = rs.rand(24, 36, 48, 12).astype(np.float32)
    audio = rs.rand(24, 1024).astype(np.float32)
    video = rs.rand(24, 224, 298, 3).astype(np.float32)
    batch = Batch(
        acoustic=acoustic,
        audio=audio,
        mfcc=jnp.zeros((24, 12)),
        video=video,
        action=jnp.zeros((24,), jnp.int32),
        location=jnp.zeros((24,), jnp.int32),
        filtered_mfcc=jnp.zeros((24, 12)),
    )
    params, batch_stats = task.init_variables(jax.random.key(0), batch)
    art = str(tmp_path / "emb_art")
    manifest = serving.export_embedding(
        task, _State(params, batch_stats), art, use_mean=True
    )
    assert manifest["kind"] == "embedding" and manifest["use_mean"] is True

    model = serving.load_artifact(art)
    z = model.embed(acoustic, audio, video, seed=5)
    ref = jax.device_get(
        task.embeddings(
            params, batch_stats, batch, jax.random.key(np.int32(5)), use_mean=True
        )
    )
    for mod in ("acoustic", "audio", "video"):
        assert z[mod].shape == (2, manifest["latent_dim"])
        np.testing.assert_allclose(z[mod], ref[mod], rtol=0, atol=5e-5)
    with pytest.raises(ValueError, match="multiple of 12"):
        model.embed(acoustic[:13], audio[:13], video[:13])


@pytest.mark.slow
def test_projection_artifact_matches_in_process(tmp_path):
    """Projection artifact: video/audio in, acoustic image decoded from
    the translated latent out, parity vs ProjectTask._forward (the
    trainer_proietta.py deployment path — no acoustic input consumed)."""
    from acoustic_image_generation_tpu.train.project import ProjectTask

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=2, sample_length=1),
        model=ModelConfig(embedding=True, project=True, encoder_type="Video"),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
        run=RunConfig(exp_name="proj", checkpoint_dir=str(tmp_path), seed=0),
        parallel=ParallelConfig(compute_dtype="float32"),
    )
    task = ProjectTask(cfg)
    rs = np.random.RandomState(4)
    audio = rs.rand(24, 1024).astype(np.float32)
    video = rs.rand(24, 224, 298, 3).astype(np.float32)
    zero_batch = Batch(
        acoustic=jnp.zeros((24, 36, 48, 12)),
        audio=audio,
        mfcc=jnp.zeros((24, 12)),
        video=video,
        action=jnp.zeros((24,), jnp.int32),
        location=jnp.zeros((24,), jnp.int32),
        filtered_mfcc=jnp.zeros((24, 12)),
    )
    params, batch_stats = task.init_variables(jax.random.key(0), zero_batch)
    art = str(tmp_path / "proj_art")
    manifest = serving.export_projection(task, _State(params, batch_stats), art)
    assert manifest["kind"] == "projection"
    assert manifest["encoder_type"] == "Video"

    model = serving.load_artifact(art)
    gen = model.project(audio, video, seed=9)
    _, out, _, _, _, _ = task._forward(
        params, batch_stats, zero_batch, {"latent": jax.random.key(np.int32(9))},
        train=False,
    )
    ref = np.asarray(out.output, np.float32)
    assert gen.shape == (2, 36, 48, 12)
    np.testing.assert_allclose(gen, ref, rtol=0, atol=5e-5)
    assert (gen >= 0).all() and (gen <= 1).all()


@pytest.mark.slow
def test_joint_artifact_matches_in_process(tmp_path):
    """Joint-MVAE artifact (onlyaudiovideo / JointTwomvae): video+audio
    in, acoustic image decoded from the associator's acoustic feature
    map out, parity vs the in-process path (trainermulti.py semantics).
    The plain jointmvae variant must refuse (its associator consumes
    real acoustic features)."""
    from acoustic_image_generation_tpu.train.joint import JointTask

    def make_task(**model_kw):
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=2, sample_length=1),
            model=ModelConfig(embedding=True, jointmvae=True, **model_kw),
            optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
            run=RunConfig(exp_name="joint", checkpoint_dir=str(tmp_path), seed=0),
            parallel=ParallelConfig(compute_dtype="float32"),
        )
        return JointTask(cfg)

    task = make_task(onlyaudiovideo=True)
    rs = np.random.RandomState(5)
    audio = rs.rand(24, 1024).astype(np.float32)
    video = rs.rand(24, 224, 298, 3).astype(np.float32)
    zero_batch = Batch(
        acoustic=jnp.zeros((24, 36, 48, 12)),
        audio=audio,
        mfcc=jnp.zeros((24, 12)),
        video=video,
        action=jnp.zeros((24,), jnp.int32),
        location=jnp.zeros((24,), jnp.int32),
        filtered_mfcc=jnp.zeros((24, 12)),
    )
    params, batch_stats = task.init_variables(jax.random.key(0), zero_batch)
    art = str(tmp_path / "joint_art")
    manifest = serving.export_joint(task, _State(params, batch_stats), art)
    assert manifest["kind"] == "joint"
    assert manifest["variant"] == "onlyaudiovideo"

    model = serving.load_artifact(art)
    gen = model.project(audio, video, seed=11)
    # in-process twin of the serve path
    rngs = {"latent": jax.random.key(np.int32(11))}
    inputs = task._inputs(zero_batch)
    _, f_vi, f_au = task._features(params, batch_stats, inputs, rngs, train=False)
    pred = task.associator1.apply({"params": params["associator1"]}, f_vi, f_au)
    ref = np.asarray(
        task._stage2(params, batch_stats, "acoustic", pred["ac"], rngs).output,
        np.float32,
    )
    assert gen.shape == (2, 36, 48, 12)
    np.testing.assert_allclose(gen, ref, rtol=0, atol=5e-5)

    plain = make_task()
    with pytest.raises(ValueError, match="onlyaudiovideo or --fusion"):
        serving.export_joint(plain, _State(params, batch_stats), str(tmp_path / "x"))


@pytest.mark.slow
def test_serve_info_cli(tiny_flagship, capsys):
    """`tools serve-info` prints the manifest without loading the
    module; --json round-trips it."""
    from acoustic_image_generation_tpu.cli import tools

    rc = tools.main(["serve-info", tiny_flagship["art_dir"]])
    out = capsys.readouterr().out
    assert rc == 0
    assert "kind:      generation" in out
    assert "energy:    True" in out
    assert "module:" in out and "sha256:" in out
    rc = tools.main(["serve-info", "--json", tiny_flagship["art_dir"]])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out)
    assert manifest == tiny_flagship["manifest"]
    assert tools.main(["serve-info", "/nonexistent"]) == 2
    capsys.readouterr()


def test_load_rejects_unknown_format(tmp_path):
    os.makedirs(tmp_path / "art", exist_ok=True)
    with open(tmp_path / "art" / "manifest.json", "w") as f:
        json.dump({"format": "aig-serving-v999"}, f)
    with pytest.raises(ValueError, match="unsupported serving artifact"):
        serving.load_artifact(str(tmp_path / "art"))


@pytest.mark.slow
def test_load_rejects_mismatched_module(tiny_flagship, tmp_path):
    """manifest.json and module.stablehlo must belong to the same
    export: a tampered/mixed pair fails at load time with a clear
    message, not later with an opaque unpack/shape error."""
    import shutil

    t = tiny_flagship
    art = tmp_path / "mixed"
    shutil.copytree(t["art_dir"], art)
    # truncate the module: byte-count check fires first
    blob = (art / "module.stablehlo").read_bytes()
    (art / "module.stablehlo").write_bytes(blob[:-1])
    with pytest.raises(ValueError, match="do not belong to the same export"):
        serving.load_artifact(str(art))
    # same length, different content: the sha256 check fires
    (art / "module.stablehlo").write_bytes(blob[:-1] + bytes([blob[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="digest mismatch"):
        serving.load_artifact(str(art))
    # intact pair loads
    (art / "module.stablehlo").write_bytes(blob)
    assert serving.load_artifact(str(art)).kind == "generation"


@pytest.mark.slow
def test_external_weights_artifact_matches_baked(tiny_flagship, tmp_path):
    """external_weights=True ships a small pure-program module plus
    weights.msgpack; the loaded artifact must reproduce the baked
    artifact bit-for-bit (same program, weights as arguments), and a
    tampered weights file must be rejected at load time."""
    t = tiny_flagship
    art = str(tmp_path / "ext")
    manifest = serving.export_generation(
        t["task"], _State(t["params"], t["batch_stats"]), art,
        energy=True, external_weights=True,
    )
    assert manifest["external_weights"] is True
    assert manifest["weights_bytes"] == os.path.getsize(
        os.path.join(art, "weights.msgpack")
    )
    # the module carries no weight constants: it must be a small
    # fraction of the baked module's size
    baked_bytes = t["manifest"]["module_bytes"]
    assert manifest["module_bytes"] < baked_bytes / 3, (
        manifest["module_bytes"], baked_bytes)
    model = serving.load_artifact(art)
    gen, energy = model.generate(t["mfcc"], t["video"], seed=7)
    baked = serving.load_artifact(t["art_dir"])
    gen_b, energy_b = baked.generate(t["mfcc"], t["video"], seed=7)
    np.testing.assert_allclose(gen, gen_b, rtol=0, atol=1e-6)
    np.testing.assert_allclose(energy, energy_b, rtol=0, atol=1e-4)
    # tampered weights are rejected before the first call
    wpath = os.path.join(art, "weights.msgpack")
    wblob = open(wpath, "rb").read()
    open(wpath, "wb").write(wblob[:-1] + bytes([wblob[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="weights.msgpack digest mismatch"):
        serving.load_artifact(art)
    open(wpath, "wb").write(wblob)
    assert serving.load_artifact(art).kind == "generation"


def test_external_weights_rejects_spatial_shards(tiny_flagship, tmp_path):
    t = tiny_flagship
    with pytest.raises(ValueError, match="incompatible with spatial_shards"):
        serving.export_generation(
            t["task"], _State(t["params"], t["batch_stats"]),
            str(tmp_path / "x"), external_weights=True, spatial_shards=2,
        )


def test_manifest_records_module_digest(tiny_flagship):
    t = tiny_flagship
    import hashlib

    blob = open(os.path.join(t["art_dir"], "module.stablehlo"), "rb").read()
    assert t["manifest"]["module_sha256"] == hashlib.sha256(blob).hexdigest()


def test_runtime_platform_mapping(monkeypatch):
    """'gpu' backends must resolve to the concrete cuda/rocm lowering
    name (jax.export has no 'gpu' platform) — for loading AND export."""

    class _Dev:
        class client:
            platform_version = "rocm 6.1 something"

    monkeypatch.setattr(jax, "default_backend", lambda: "gpu")
    monkeypatch.setattr(jax, "devices", lambda: [_Dev()])
    assert serving.runtime_platforms() == ("rocm",)
    assert serving.default_export_platform() == "rocm"
    _Dev.client.platform_version = "cuda 12030"
    assert serving.runtime_platforms() == ("cuda",)
    assert serving.default_export_platform() == "cuda"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert serving.runtime_platforms() == ("tpu",)
    assert serving.default_export_platform() == "tpu"


@pytest.mark.slow
def test_artifact_http_server_round_trip(tiny_flagship):
    """core/server.py: the HTTP daemon over a generation artifact must
    return the same bytes as calling the loaded model directly, expose
    the manifest, and reject malformed requests with a 400."""
    import io
    import urllib.request
    import urllib.error

    from acoustic_image_generation_tpu.core.server import ArtifactServer

    t = tiny_flagship
    server = ArtifactServer(t["art_dir"], port=0)
    server.start()
    base = f"http://{server.host}:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["kind"] == "generation"
        with urllib.request.urlopen(f"{base}/manifest", timeout=30) as r:
            assert json.load(r)["format"] == serving.FORMAT

        buf = io.BytesIO()
        np.savez(buf, mfcc=t["mfcc"], video=t["video"], seed=np.int32(7))
        req = urllib.request.Request(
            f"{base}/call", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = np.load(io.BytesIO(r.read()))
            gen, energy = out["generated"], out["energy"]
        direct_gen, direct_energy = server.model.generate(
            t["mfcc"], t["video"], seed=7
        )
        np.testing.assert_array_equal(gen, direct_gen)
        np.testing.assert_array_equal(energy, direct_energy)

        # the symmetric client wrapper: same method surface as the
        # locally loaded ServingModel, byte-identical results
        from acoustic_image_generation_tpu.core.client import ArtifactClient

        client = ArtifactClient(base)
        assert client.kind == "generation" and client.healthy()
        c_gen, c_energy = client.generate(t["mfcc"], t["video"], seed=7)
        np.testing.assert_array_equal(c_gen, direct_gen)
        np.testing.assert_array_equal(c_energy, direct_energy)

        # malformed requests -> 400 with an error payload, never a
        # dropped socket: missing array (KeyError), empty body
        # (EOFError), corrupt npz (BadZipFile)
        buf = io.BytesIO()
        np.savez(buf, mfcc=t["mfcc"])
        for payload in (buf.getvalue(), b"", b"PK\x03\x04corrupt"):
            req = urllib.request.Request(
                f"{base}/call", data=payload, method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=30)
            assert exc.value.code == 400
            assert "error" in json.load(exc.value)
        # oversized Content-Length -> 413 before any buffering
        server.max_body_bytes = 16
        req = urllib.request.Request(
            f"{base}/call", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 413
    finally:
        server.shutdown()


def test_export_rejects_fused_qgemm_artifacts(tiny_flagship, tmp_path):
    """The Pallas fused-GEMM trunk lowers as a TPU-only Mosaic custom
    call — int8 artifacts must be exported without it (and it measured
    slower than XLA anyway, docs/PERF.md)."""
    import copy

    t = tiny_flagship
    task = copy.copy(t["task"])
    task.cfg = copy.deepcopy(t["task"].cfg)
    object.__setattr__(task.cfg.model, "fused_qgemm", True)
    with pytest.raises(ValueError, match="fused_qgemm"):
        serving.export_generation(
            task, _State(t["params"], t["batch_stats"]), str(tmp_path / "x"),
            qtrunk={"dummy": jnp.zeros(1)},
        )


def test_export_rejects_energy_for_non12ch(tiny_flagship, tmp_path):
    # music recipes carry 13 channels (find_logen's inversion is a
    # 12-coefficient DCT): energy export must refuse
    import copy

    t = tiny_flagship
    task13 = copy.copy(t["task"])
    task13.cfg = copy.deepcopy(t["task"].cfg)
    object.__setattr__(task13.cfg.data, "datatype", "music")
    assert task13.cfg.data.num_channels == 13
    with pytest.raises(ValueError, match="12-channel"):
        serving.export_generation(
            task13, _State(t["params"], t["batch_stats"]), str(tmp_path / "x"),
            energy=True,
        )
