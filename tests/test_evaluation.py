"""Localization / retrieval metric tests against the reference's NumPy
semantics (oracle ports of iouenergythreshold.py / showimages_bb.py /
knn.py / retrieve.py / areaundercurve.py / meanstd.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from acoustic_image_generation_tpu.dsp.energy import find_logen_numpy_oracle
from acoustic_image_generation_tpu.evaluation import (
    box_weighted_iou,
    energy_mask,
    iou_real_vs_generated,
    knn_accuracy,
    localization_auc,
    retrieval_ranks,
    threshold_fractions,
    trimmed_mean_std,
)
from acoustic_image_generation_tpu.evaluation.iou import render_box_map

rng = np.random.default_rng(7)


def _iou_oracle(real, gen):
    """Per-image host oracle mirroring iouenergythreshold.py:218-229."""
    out = []
    for h in range(real.shape[0]):
        m1 = 1 * (find_logen_numpy_oracle(real[h]) > np.mean(find_logen_numpy_oracle(real[h])))
        m2 = 1 * (find_logen_numpy_oracle(gen[h]) > np.mean(find_logen_numpy_oracle(gen[h])))
        inter = np.logical_and(m1, m2)
        union = np.logical_or(m1, m2)
        out.append(np.sum(inter) / np.sum(union))
    return np.asarray(out)


def test_iou_matches_host_oracle():
    real = rng.random((4, 36, 48, 12)).astype(np.float32)
    gen = rng.random((4, 36, 48, 12)).astype(np.float32)
    got = np.asarray(iou_real_vs_generated(jnp.asarray(real), jnp.asarray(gen)))
    expected = _iou_oracle(real, gen)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_identical_images_have_iou_one():
    x = rng.random((2, 36, 48, 12)).astype(np.float32)
    got = np.asarray(iou_real_vs_generated(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, 1.0)


def test_threshold_fractions_and_auc():
    ious = np.array([0.05, 0.15, 0.55, 0.95])
    fr = threshold_fractions(ious)
    assert fr[0.0] == 1.0
    assert fr[0.5] == 0.5
    assert fr[1.0] == 0.0
    # AUC of a monotone step curve equals trapezoid area
    auc = localization_auc(fr)
    assert 0.0 < auc < 1.0
    # constant-1 curve -> area 1.0
    assert localization_auc({t: 1.0 for t in np.arange(0, 1.01, 0.1)}) == pytest.approx(1.0)


def test_energy_mask_shape():
    x = rng.random((3, 36, 48, 12)).astype(np.float32)
    m = energy_mask(jnp.asarray(x))
    assert m.shape == (3, 36, 48)
    assert m.dtype == jnp.bool_


def test_energy_mask_invert_selects_amplitude_blob():
    """Synthetic-benchmark convention: blob energy stored as channel
    AMPLITUDE anti-correlates with find_logen's 1/sum(exp) inversion —
    the source region is the BELOW-mean set (invert=True); the
    reference's above-mean default selects the complement. Both masks
    partition the same field, so real-vs-generated IoU is unaffected."""
    yy, xx = np.mgrid[:36, :48].astype(np.float32)
    blob = np.exp(-(((yy - 12) ** 2) + ((xx - 30) ** 2)) / (2 * 4.0**2))
    img = (blob[None, :, :, None] * np.ones(12, np.float32)
           + 0.02 * rng.random((1, 36, 48, 12)).astype(np.float32))
    m_ref = np.asarray(energy_mask(jnp.asarray(img)))
    m_inv = np.asarray(energy_mask(jnp.asarray(img), invert=True))
    assert not m_ref[0, 12, 30]  # reference mask excludes the blob peak
    assert m_inv[0, 12, 30]  # inverted mask covers it
    assert m_inv[0].mean() < 0.5 < m_ref[0].mean()


def test_render_box_map_weights():
    xmin = jnp.asarray([[10, 50, 0]])
    xmax = jnp.asarray([[60, 80, 0]])  # third box absent (xmax==0)
    ymin = jnp.asarray([[20, 30, 0]])
    ymax = jnp.asarray([[60, 70, 0]])
    m = np.asarray(render_box_map(xmin, xmax, ymin, ymax))
    assert m.shape == (1, 224, 298)
    assert m[0, 25, 15] == 0.5  # inside box 1 only
    assert m[0, 40, 55] == pytest.approx(1.0)  # box overlap summed, clipped at 1
    assert m[0, 0, 0] == 0.0
    # weighted IoU with a random generated image is finite in [0, 1]
    gen = jnp.asarray(rng.random((1, 36, 48, 12)).astype(np.float32))
    iou = float(box_weighted_iou(gen, jnp.asarray(m))[0])
    assert 0.0 <= iou <= 1.0


def test_knn_matches_sklearn():
    from sklearn.neighbors import KNeighborsClassifier

    train_x = rng.normal(size=(60, 8)).astype(np.float32)
    train_y = rng.integers(0, 3, 60)
    test_x = rng.normal(size=(20, 8)).astype(np.float32)
    test_y = rng.integers(0, 3, 20)
    sk = KNeighborsClassifier(n_neighbors=15).fit(train_x, train_y)
    expected = sk.score(test_x, test_y)
    got = knn_accuracy(train_x, train_y, test_x, test_y, k=15)
    assert got == pytest.approx(expected)


def test_retrieval_ranks_perfect_and_confusion():
    # gallery identical to anchors -> rank1 == 1.0
    x = rng.normal(size=(10, 6)).astype(np.float32)
    y = rng.integers(0, 3, 10)
    out = retrieval_ranks(x, y, x, y, num_classes=3)
    assert out["rank1"] == 1.0
    assert out["confusion_rank1"].sum() == 10
    assert np.trace(out["confusion_rank1"]) == 10


def test_trimmed_mean_std():
    # meanstd.py drops one min and one max
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    mean, std = trimmed_mean_std(vals)
    assert mean == pytest.approx(3.0)
    assert std == pytest.approx(np.std([2.0, 3.0, 4.0]))


def test_export_knn_retrieve_integration(tmp_path):
    """extract -> knn/retrieve protocol round trip on synthetic latents."""
    from acoustic_image_generation_tpu.evaluation.export import (
        export_features,
        load_features,
    )

    feats = rng.normal(size=(30, 150)).astype(np.float32)
    labels = rng.integers(0, 3, 30)
    scen = rng.integers(0, 5, 30)
    d = export_features(str(tmp_path), "testing", "acoustic", 7, feats, labels, scen, 3, 5)
    x, y, s = load_features(d, "testing")
    np.testing.assert_array_equal(x, feats)
    np.testing.assert_array_equal(y, labels)
    np.testing.assert_array_equal(s, scen)
    acc = knn_accuracy(x, y, x, y, k=1)
    assert acc == 1.0  # self-retrieval with k=1 is perfect
    ranks = retrieval_ranks(x, y, x, y, num_classes=3)
    assert ranks["rank1"] == 1.0


def test_energy_map_bf16_inputs():
    """find_logen must upcast: bf16 inputs overflow exp() and zero the map."""
    x = rng.random((2, 36, 48, 12)).astype(np.float32)
    f32 = np.asarray(iou_real_vs_generated(jnp.asarray(x), jnp.asarray(x)))
    bf16 = np.asarray(
        iou_real_vs_generated(jnp.asarray(x), jnp.asarray(x, jnp.bfloat16))
    )
    assert np.all(f32 == 1.0)
    assert np.all(bf16 > 0.9)


def test_knn_and_retrieval_chunking_equivalence():
    """The chunked distance paths (working set chunk x N instead of the
    full N x N — needed at real-ACIVW scale) give identical results to a
    single-block computation."""
    rng = np.random.default_rng(11)
    tr_x = rng.normal(size=(200, 16)).astype(np.float32)
    tr_y = rng.integers(0, 4, 200)
    te_x = rng.normal(size=(150, 16)).astype(np.float32)
    te_y = rng.integers(0, 4, 150)

    one_block = knn_accuracy(tr_x, tr_y, te_x, te_y, k=5, chunk=10_000)
    chunked = knn_accuracy(tr_x, tr_y, te_x, te_y, k=5, chunk=7)
    assert one_block == chunked

    a = retrieval_ranks(te_x, te_y, tr_x, tr_y, num_classes=4)
    a_chunked = retrieval_ranks(te_x, te_y, tr_x, tr_y, num_classes=4, chunk=7)
    # multi-chunk path (crosses many block boundaries) matches one block
    for k in (1, 2, 5, 10, 30):
        assert a[f"rank{k}"] == a_chunked[f"rank{k}"]
    np.testing.assert_array_equal(a["confusion_rank1"], a_chunked["confusion_rank1"])
    # and both match a full-order reference computed independently inline
    d = (
        np.sum(te_x**2, 1)[:, None]
        - 2.0 * te_x @ tr_x.T
        + np.sum(tr_x**2, 1)[None, :]
    )
    order = np.argsort(d, axis=1, kind="stable")
    for k in (1, 2, 5, 10, 30):
        want = np.mean([
            te_y[i] in tr_y[order[i, :k]] for i in range(len(te_y))
        ])
        assert a[f"rank{k}"] == want
