"""Cross-modal metric losses: batch-hard triplet, all-triplets, NCA.

Ports of the trainer-embedded implementations:
- pairwise squared distances between two embedding sets
  (``/root/reference/trainer/trainer_three.py:551-591``);
- positive mask = same action label AND same location/scenario, negative
  mask = either differs (``trainer_three.py:593-623``);
- batch-hard ``mix_data_hard`` (``trainer_three.py:648-683``);
- all-valid-triplets ``mix_all`` (``trainer_three.py:685-732``);
- NCA with hardest positive + log-sum-exp of negatives
  (``trainer2.py:577-603``), including the reference's min/max
  normalization of the distance matrix (rows broadcast quirk preserved).

Everything is batched jnp (MXU matmuls + VPU masking) — no host loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_sq_distances(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross-modal "distance" matrix with the reference's exact expansion.

    NOTE the reference computes ``dist[i, j] = ||a_j||^2 - 2 a_i.b_j +
    ||b_i||^2`` (``trainer_three.py:562-578``): the squared-norm vectors
    broadcast against the *unmatched* axes of the cross dot-product, so only
    the diagonal is a true pair distance ||a_i - b_i||^2. This is a bug
    preserved for parity — the metric losses were trained with it. Clamped
    at 0 like the reference.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq_a = jnp.sum(a * a, axis=1)  # (B,)
    sq_b = jnp.sum(b * b, axis=1)
    dot_ab = a @ b.T  # (B, B); element [i,j] = a_i . b_j
    d = sq_a[None, :] - 2.0 * dot_ab + sq_b[:, None]
    return jnp.maximum(d, 0.0)


def positive_negative_masks(labels: jnp.ndarray, scenario: jnp.ndarray):
    """(positive, negative) boolean masks. Positive: same label and same
    scenario (self-pairs allowed — embeddings come from different
    modalities). Negative: different label OR different scenario."""
    labels_eq = labels[None, :] == labels[:, None]
    scen_eq = scenario[None, :] == scenario[:, None]
    pos = labels_eq & scen_eq
    neg = ~labels_eq | ~scen_eq
    return pos, neg


def triplet_hard(z0, z1, labels, scenario, margin: float):
    """Batch-hard triplet loss (``mix_data_hard``). Returns (loss,
    fraction_of_positive_triplets)."""
    dist = pairwise_sq_distances(z0, z1)
    pos, neg = positive_negative_masks(labels, scenario)
    pos_f = pos.astype(jnp.float32)
    neg_f = neg.astype(jnp.float32)

    hardest_pos = jnp.max(pos_f * dist, axis=1, keepdims=True)
    max_dist = jnp.max(dist, axis=1, keepdims=True)
    masked_neg = dist + max_dist * (1.0 - neg_f)
    hardest_neg = jnp.min(masked_neg, axis=1, keepdims=True)

    tl = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)

    mask3 = _triplet_mask(labels, scenario).astype(jnp.float32)
    num_positive = jnp.sum((tl > 1e-16).astype(jnp.float32))
    num_valid = jnp.sum(mask3)
    frac = num_positive / (num_valid + 1e-16)
    return jnp.mean(tl), frac


def triplet_all(z0, z1, labels, scenario, margin: float):
    """All-valid-triplets loss (``mix_all``). Returns (loss, fraction)."""
    dist = pairwise_sq_distances(z0, z1)
    tl = dist[:, :, None] - dist[:, None, :] + margin
    mask = _triplet_mask(labels, scenario).astype(jnp.float32)
    tl = jnp.maximum(mask * tl, 0.0)
    num_positive = jnp.sum((tl > 1e-16).astype(jnp.float32))
    num_valid = jnp.sum(mask)
    frac = num_positive / (num_valid + 1e-16)
    loss = jnp.sum(tl) / (num_positive + 1e-16)
    return loss, frac


def _triplet_mask(labels, scenario):
    """mask[a, p, n] valid iff (a, p) same video and (a, n) different
    (``trainer_three.py:625-642``)."""
    same = (labels[None, :] == labels[:, None]) & (scenario[None, :] == scenario[:, None])
    i_eq_j = same[:, :, None]
    i_eq_k = same[:, None, :]
    return i_eq_j & ~i_eq_k


def nca_loss(z0, z1, labels, scenario):
    """NCA-style loss (``trainer2.py:577-603``): min-max normalize the
    distance matrix, hardest positive + log(sum exp(-negative dists))."""
    dist = pairwise_sq_distances(z0, z1)
    # Reference subtracts the per-row min/max *without* keepdims — the
    # (B,) vectors broadcast over rows, i.e. a per-column shift. Preserved.
    dist = dist - jnp.min(dist, axis=1)
    dist = dist / jnp.max(dist, axis=1)
    pos, neg = positive_negative_masks(labels, scenario)
    pos_dist = pos.astype(jnp.float32) * dist
    hardest_pos = jnp.max(pos_dist, axis=1, keepdims=True)
    neg_dist = neg.astype(jnp.float32) * dist
    sum_neg = jnp.sum(jnp.exp(-neg_dist), axis=1, keepdims=True)
    return jnp.mean(hardest_pos + jnp.log(1e-15 + sum_neg))
