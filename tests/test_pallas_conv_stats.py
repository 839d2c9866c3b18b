"""Fused conv+BN-stats kernel (ops/pallas_conv_stats) against the plain
XLA path: same outputs, same updated moving statistics, same variable
tree (interpret mode off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.models.resnet import ResNet50
from acoustic_image_generation_tpu.ops.pallas_conv_stats import matmul_stats


def test_matmul_stats_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((300, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 192)).astype(np.float32))
    y, s, ss = matmul_stats(x, w, interpret=True)
    ref = np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
    # sums cover only the real rows (zero padding contributes nothing)
    np.testing.assert_allclose(np.asarray(s), ref.sum(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ss), (ref**2).sum(0), rtol=1e-4)


def test_fused_resnet_matches_plain_train_path():
    """Same params + same train batch -> same features and same updated
    BN statistics whether the 1x1 convs run fused or through XLA."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 96, 128, 3)).astype(np.float32))
    blocks = ((16, 1, 1), (16, 1, 2), (16, 1, 2), (16, 1, 1))

    plain = ResNet50(blocks=blocks)
    fused = ResNet50(blocks=blocks, fused_bn_stats=True)
    variables = plain.init({"params": jax.random.key(0)}, x, train=False)

    out_p, mut_p = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    out_f, mut_f = fused.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_p, np.float32),
        rtol=2e-3, atol=2e-3,
    )
    leaves_p = jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"])
    leaves_f = jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"])
    assert [p for p, _ in leaves_p] == [p for p, _ in leaves_f]
    for (path, a), (_, b) in zip(leaves_p, leaves_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=str(path)
        )
    # eval path is byte-identical code (fused only affects train)
    e_p = plain.apply(variables, x, train=False)
    e_f = fused.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e_p), np.asarray(e_f))
