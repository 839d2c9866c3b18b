"""Loss-function golden tests against brute-force NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from acoustic_image_generation_tpu.losses import (
    accuracy,
    huber_tf,
    kl_diag_gaussian,
    l2_regularization,
    mse_tf,
    nca_loss,
    pairwise_sq_distances,
    sigmoid_ce_logits,
    softmax_cross_entropy,
    triplet_all,
    triplet_hard,
)

rng = np.random.default_rng(42)


def test_mse_huber_match_formulas():
    a = rng.normal(size=(4, 5)).astype(np.float32)
    b = rng.normal(size=(4, 5)).astype(np.float32)
    assert float(mse_tf(a, b)) == pytest.approx(np.mean((a - b) ** 2), rel=1e-6)
    err = np.abs(b - a)
    expected = np.mean(np.where(err <= 1.0, 0.5 * err**2, err - 0.5))
    assert float(huber_tf(a, b)) == pytest.approx(expected, rel=1e-6)


def test_kl_standard_normal_is_near_zero():
    mean = jnp.zeros((3, 10))
    std = jnp.ones((3, 10))
    kl = np.asarray(kl_diag_gaussian(mean, std))
    # exact formula has the 1e-8 inside the log: 0.5*sum(-log(1+1e-8))
    assert np.allclose(kl, 0.0, atol=1e-5)
    # nonzero mean increases it by 0.5*||mean||^2
    kl2 = np.asarray(kl_diag_gaussian(jnp.ones((3, 10)), std))
    assert np.allclose(kl2, 5.0, atol=1e-4)


def test_pairwise_distances_orientation():
    a = rng.normal(size=(6, 8)).astype(np.float32)
    b = rng.normal(size=(6, 8)).astype(np.float32)
    d = np.asarray(pairwise_sq_distances(jnp.asarray(a), jnp.asarray(b)))
    # reference layout (quirk preserved): d[i,j] = ||a_j||^2 - 2 a_i.b_j + ||b_i||^2
    for i in range(6):
        for j in range(6):
            expected = max(a[j] @ a[j] - 2 * a[i] @ b[j] + b[i] @ b[i], 0.0)
            assert d[i, j] == pytest.approx(expected, rel=1e-4, abs=1e-4)
    # diagonal is the true pair distance
    for i in range(6):
        assert d[i, i] == pytest.approx(np.sum((a[i] - b[i]) ** 2), rel=1e-4, abs=1e-4)


def _masks(labels, scenario):
    same = (labels[None, :] == labels[:, None]) & (scenario[None, :] == scenario[:, None])
    return same


def test_triplet_all_matches_bruteforce():
    B, D, margin = 5, 4, 0.2
    z0 = rng.normal(size=(B, D)).astype(np.float32)
    z1 = rng.normal(size=(B, D)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2])
    scenario = np.array([0, 0, 0, 1, 0])
    loss, frac = triplet_all(jnp.asarray(z0), jnp.asarray(z1), jnp.asarray(labels), jnp.asarray(scenario), margin)

    d = np.asarray(pairwise_sq_distances(jnp.asarray(z0), jnp.asarray(z1)))
    same = _masks(labels, scenario)
    total, n_pos, n_valid = 0.0, 0, 0
    for a in range(B):
        for p in range(B):
            for n in range(B):
                if same[a, p] and not same[a, n]:
                    n_valid += 1
                    val = max(d[a, p] - d[a, n] + margin, 0.0)
                    if val > 1e-16:
                        n_pos += 1
                        total += val
    assert float(loss) == pytest.approx(total / (n_pos + 1e-16), rel=1e-4)
    assert float(frac) == pytest.approx(n_pos / (n_valid + 1e-16), rel=1e-5)


def test_triplet_hard_matches_bruteforce():
    B, D, margin = 6, 3, 0.5
    z0 = rng.normal(size=(B, D)).astype(np.float32)
    z1 = rng.normal(size=(B, D)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    scenario = np.array([0, 0, 0, 0, 1, 1])
    loss, _ = triplet_hard(jnp.asarray(z0), jnp.asarray(z1), jnp.asarray(labels), jnp.asarray(scenario), margin)

    d = np.asarray(pairwise_sq_distances(jnp.asarray(z0), jnp.asarray(z1)))
    same = _masks(labels, scenario)
    per_anchor = []
    for a in range(B):
        hp = max(d[a, p] for p in range(B) if same[a, p])
        hn = min(d[a, n] for n in range(B) if not same[a, n])
        per_anchor.append(max(hp - hn + margin, 0.0))
    assert float(loss) == pytest.approx(np.mean(per_anchor), rel=1e-4)


def test_nca_finite_and_orders():
    B, D = 6, 4
    z0 = rng.normal(size=(B, D)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    scenario = np.zeros(B, dtype=np.int64)
    val = float(nca_loss(jnp.asarray(z0), jnp.asarray(z0), jnp.asarray(labels), jnp.asarray(scenario)))
    assert np.isfinite(val)


def test_softmax_ce_and_accuracy():
    logits = np.array([[2.0, 1.0, 0.1], [0.0, 3.0, 0.0]], dtype=np.float32)
    labels = np.array([[1, 0, 0], [0, 0, 1]], dtype=np.float32)
    p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    expected = -np.mean([np.log(p[0, 0]), np.log(p[1, 2])])
    assert float(softmax_cross_entropy(jnp.asarray(labels), jnp.asarray(logits))) == pytest.approx(expected, rel=1e-5)
    assert float(accuracy(jnp.asarray(logits), jnp.asarray(labels))) == pytest.approx(0.5)


def test_sigmoid_ce_logits_matches_torch_oracle():
    """Oracle: torch.nn.functional.binary_cross_entropy_with_logits (the
    same math as tf.nn.sigmoid_cross_entropy_with_logits). Includes
    extreme logits (+-500) where a naive log(sigmoid(l)) would produce
    inf/nan — the stable form must stay finite and exact."""
    import torch

    logits = np.concatenate(
        [rng.normal(0, 3, 500), np.array([-500.0, -88.0, 88.0, 500.0])]
    ).astype(np.float32)
    labels = np.concatenate(
        [rng.uniform(0, 1, 500), np.array([0.0, 1.0, 0.0, 1.0])]
    ).astype(np.float32)
    expected = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(sigmoid_ce_logits(jnp.asarray(labels), jnp.asarray(logits)))
    assert np.isfinite(got)
    assert got == pytest.approx(expected, rel=1e-6)


def test_sigmoid_ce_gradient_alive_at_saturation():
    """The collapse-repair property: at logit -500 the MSE gradient is
    exactly zero (sigmoid' underflows) but the BCE logit-gradient is
    (sigmoid(l) - t) = -t, still full-strength."""
    import jax

    labels = jnp.asarray([1.0, 0.0])
    g_bce = jax.grad(
        lambda l: sigmoid_ce_logits(labels, l)
    )(jnp.asarray([-500.0, -500.0]))
    # d/dl mean BCE = (sigmoid(l) - t)/n = (0 - 1)/2 and (0 - 0)/2
    np.testing.assert_allclose(np.asarray(g_bce), [-0.5, 0.0], atol=1e-7)
    g_mse = jax.grad(
        lambda l: mse_tf(labels, jax.nn.sigmoid(l))
    )(jnp.asarray([-500.0, -500.0]))
    np.testing.assert_allclose(np.asarray(g_mse), [0.0, 0.0], atol=0)


def test_l2_regularization_kernels_only():
    params = {
        "layer1": {"kernel": jnp.full((2, 2), 2.0), "bias": jnp.full((4,), 100.0)},
        "bn": {"scale": jnp.full((4,), 100.0)},
    }
    # 0.5 * scale * sum(kernel^2) = 0.5 * 0.1 * 16
    assert float(l2_regularization(params, 0.1)) == pytest.approx(0.8)
    assert float(l2_regularization(params, 0.0)) == 0.0
