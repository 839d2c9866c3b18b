"""Int8 frozen-trunk path (models/quant.py): BN-fold exactness, quantized
feature fidelity vs the f32 trunk, and end-to-end training through
GenerationTask with ``trunk_quant="int8"``."""

import jax
import jax.numpy as jnp
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
from acoustic_image_generation_tpu.models import quant
from acoustic_image_generation_tpu.models.resnet import ResNet50

TINY_BLOCKS = ((64, 1, 1), (128, 1, 2), (256, 1, 2), (512, 1, 1))


def _randomize_stats(stats, rng):
    """Give the running BN stats nontrivial values so folding is exercised
    beyond the (mean=0, var=1) init."""

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "mean":
                out[k] = jnp.asarray(rng.normal(0, 0.1, v.shape).astype(np.float32))
            elif k == "var":
                out[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
            else:
                out[k] = v
        return out

    return walk(stats)


def test_fold_conv_bn_exact(rng_np):
    """conv -> frozen BN == folded conv + bias, to f32 tolerance."""
    x = jnp.asarray(rng_np.standard_normal((2, 9, 9, 6)).astype(np.float32))
    kernel = jnp.asarray(rng_np.standard_normal((3, 3, 6, 8)).astype(np.float32))
    gamma = jnp.asarray(rng_np.uniform(0.5, 1.5, 8).astype(np.float32))
    beta = jnp.asarray(rng_np.standard_normal(8).astype(np.float32))
    mean = jnp.asarray(rng_np.normal(0, 0.2, 8).astype(np.float32))
    var = jnp.asarray(rng_np.uniform(0.5, 1.5, 8).astype(np.float32))

    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y_ref = (conv(x, kernel) - mean) * gamma * jax.lax.rsqrt(var + 1e-5) + beta

    conv_tree = {"conv": {"kernel": kernel}, "BatchNorm": {"scale": gamma, "bias": beta}}
    stats_tree = {"BatchNorm": {"mean": mean, "var": var}}
    w_folded, bias = quant.fold_conv_bn(conv_tree, stats_tree)
    y_folded = conv(x, w_folded) + bias
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_folded), atol=1e-5)


def test_quant_trunk_matches_f32_features(rng_np):
    """The calibrated int8 trunk tracks the eval-BN f32 trunk closely on
    the features the generator consumes."""
    model = ResNet50(blocks=TINY_BLOCKS, trunk_bn_frozen=True, freeze_trunk=True)
    video = jnp.asarray(rng_np.uniform(0, 1, (2, 224, 298, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, video, train=False)
    stats = _randomize_stats(variables["batch_stats"], rng_np)

    ref = model.apply(
        {"params": variables["params"], "batch_stats": stats},
        video, train=False, mode="trunk",
    ).astype(jnp.float32)

    qt = quant.quantize_trunk(variables["params"], stats)
    qt = quant.calibrate(qt, video, TINY_BLOCKS)
    feat, _ = quant.trunk_forward(qt, video, TINY_BLOCKS, out_dtype=jnp.float32)

    assert feat.shape == ref.shape == (2, 14, 19, 2048)
    ref_n, feat_n = np.asarray(ref).ravel(), np.asarray(feat).ravel()
    rel = np.linalg.norm(feat_n - ref_n) / max(np.linalg.norm(ref_n), 1e-9)
    assert rel < 0.1, f"relative feature error {rel:.4f}"
    corr = np.corrcoef(ref_n, feat_n)[0, 1]
    assert corr > 0.995, f"feature correlation {corr:.5f}"


def test_fused_gemm_trunk_matches_xla_trunk(rng_np):
    """trunk_forward(fused_gemm=True) — every 1x1 conv through the
    Pallas streaming GEMM (interpret mode off-TPU) — must track the XLA
    int8 trunk to within the folded-requant rounding slack (<=1 quantum
    per site, which compounds to a small fraction of the feature
    scale)."""
    model = ResNet50(blocks=TINY_BLOCKS, trunk_bn_frozen=True, freeze_trunk=True)
    video = jnp.asarray(rng_np.uniform(0, 1, (1, 224, 298, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, video, train=False)
    stats = _randomize_stats(variables["batch_stats"], rng_np)
    qt = quant.quantize_trunk(variables["params"], stats)
    qt = quant.calibrate(qt, video, TINY_BLOCKS)
    ref, _ = quant.trunk_forward(qt, video, TINY_BLOCKS, out_dtype=jnp.float32)
    got, _ = quant.trunk_forward(
        qt, video, TINY_BLOCKS, out_dtype=jnp.float32, fused_gemm=True
    )
    assert got.shape == ref.shape
    ref_n, got_n = np.asarray(ref).ravel(), np.asarray(got).ravel()
    rel = np.linalg.norm(got_n - ref_n) / max(np.linalg.norm(ref_n), 1e-9)
    assert rel < 0.05, f"fused-vs-xla trunk relative error {rel:.4f}"
    # rounding-order differences are per-site quanta; through 4 blocks
    # they stay within a few quanta of the final site's scale
    quantum = float(qt["act"]["block4_unit_1/out"]) / 127.0
    assert np.max(np.abs(got_n - ref_n)) <= 8 * quantum + 1e-6


def test_fused_gemm_trunk_identity_residual_branches(rng_np):
    """Multi-unit blocks exercise the fused-path branches TINY_BLOCKS
    cannot: stride-1 identity residuals (unit 2 of block 1) and the
    strided identity subsample (last unit of a multi-unit strided
    block) — the branches a real 3/4/6/3 ResNet50 spends most units
    in."""
    blocks = ((64, 2, 1), (128, 2, 2), (256, 1, 2), (512, 1, 1))
    model = ResNet50(blocks=blocks, trunk_bn_frozen=True, freeze_trunk=True)
    video = jnp.asarray(rng_np.uniform(0, 1, (1, 224, 298, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(1)}, video, train=False)
    stats = _randomize_stats(variables["batch_stats"], rng_np)
    qt = quant.quantize_trunk(variables["params"], stats)
    qt = quant.calibrate(qt, video, blocks)
    ref, _ = quant.trunk_forward(qt, video, blocks, out_dtype=jnp.float32)
    got, _ = quant.trunk_forward(
        qt, video, blocks, out_dtype=jnp.float32, fused_gemm=True
    )
    assert got.shape == ref.shape
    ref_n, got_n = np.asarray(ref).ravel(), np.asarray(got).ravel()
    rel = np.linalg.norm(got_n - ref_n) / max(np.linalg.norm(ref_n), 1e-9)
    assert rel < 0.05, f"fused-vs-xla trunk relative error {rel:.4f}"


def _gen_config(tmp_path, **model_kw):
    return ExperimentConfig(
        data=DataConfig(batch_size=8, sample_length=1),
        model=ModelConfig(
            embedding=True, mfcc=True, num_skip_conn=1,
            resnet_units=(1, 1, 1, 1), trunk_bn="frozen", **model_kw,
        ),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1),
        run=RunConfig(exp_name="quant", checkpoint_dir=str(tmp_path), seed=0),
        parallel=ParallelConfig(compute_dtype="float32"),
    )


def test_quant_requires_frozen_bn(tmp_path):
    from acoustic_image_generation_tpu.train.generation import GenerationTask

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8),
        model=ModelConfig(
            embedding=True, mfcc=True, trunk_bn="train", trunk_quant="int8"
        ),
        optim=OptimConfig(),
        run=RunConfig(exp_name="x", checkpoint_dir=str(tmp_path)),
        parallel=ParallelConfig(),
    )
    with pytest.raises(ValueError, match="trunk_bn"):
        GenerationTask(cfg)


@pytest.mark.slow
def test_generation_task_int8_end_to_end(tmp_path, rng_np):
    """Train steps + eval through the int8 trunk: finite losses in the
    same ballpark as the f32 path, one-time calibration, and the
    feature-cache interplay (cache filled from quantized features)."""
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
    from acoustic_image_generation_tpu.train.generation import GenerationTask
    from acoustic_image_generation_tpu.train.trainer import Trainer

    lists = write_synthetic_dataset(
        str(tmp_path / "data"), num_classes=2, videos_per_class=2, seconds_per_video=2
    )
    loader = AcousticImageDataLoader(lists["training"], "training", 8)
    for raw in loader.batches(0):
        break

    cfg_f32 = _gen_config(tmp_path / "f32")
    cfg_q = _gen_config(tmp_path / "q", trunk_quant="int8", cache_trunk_features=True)

    tr_f = Trainer(GenerationTask(cfg_f32), cfg_f32)
    tr_q = Trainer(GenerationTask(cfg_q), cfg_q)

    s_f = tr_f.init_state(raw)
    s_q = tr_q.init_state(raw)

    s_f, m_f = tr_f.train_step(s_f, raw)
    s_q, m_q = tr_q.train_step(s_q, raw)
    assert tr_q._qtrunk is not None
    lf, lq = float(m_f["loss"]), float(m_q["loss"])
    assert np.isfinite(lq)
    assert abs(lq - lf) / max(abs(lf), 1e-9) < 0.2, (lf, lq)

    # second step: cached quantized features, no trunk, still finite
    misses = tr_q.feature_cache.misses
    s_q, m2 = tr_q.train_step(s_q, raw)
    assert tr_q.feature_cache.misses == misses
    assert np.isfinite(float(m2["loss"]))

    # eval path goes through the quantized trunk too
    val = tr_q.evaluate(s_q, loader, 0)
    assert np.isfinite(val["mse"])
