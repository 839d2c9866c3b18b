"""Oracle tests for the fused int8 1x1-conv GEMM kernel
(ops/pallas_qgemm.py): interpret-mode Pallas vs the XLA twin of
models/quant.py's ``_qconv``+residual+ReLU+``_quant_act`` composition.
The s8 x s8 -> s32 dot is exact; the fused epilogue folds the requant
scale into the f32 coefficients (on-chip-measured win), which reorders
two f32 roundings, so outputs may differ from the XLA twin by at most
ONE int8 quantum on rare near-tie elements."""

import numpy as np
import jax.numpy as jnp
import pytest

from acoustic_image_generation_tpu.ops.pallas_qgemm import (
    _m_block,
    fused_q1x1,
    xla_q1x1_reference,
)


def _layer(rs, k, n):
    return {
        "w": jnp.asarray(rs.randint(-127, 128, (1, 1, k, n)), jnp.int8),
        "scale": jnp.asarray(rs.rand(n) * 0.01 + 1e-3, jnp.float32),
        "bias": jnp.asarray(rs.randn(n) * 0.5, jnp.float32),
    }


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("use_res", [True, False])
def test_fused_q1x1_matches_xla_twin(relu, use_res):
    rs = np.random.RandomState(0)
    b, h, w, k, n = 3, 7, 11, 128, 256
    x = jnp.asarray(rs.randint(-127, 128, (b, h, w, k)), jnp.int8)
    layer = _layer(rs, k, n)
    res = (
        jnp.asarray(rs.randint(-127, 128, (b, h, w, n)), jnp.int8)
        if use_res
        else None
    )
    kw = dict(
        relu=relu,
        residual=res,
        residual_amax=jnp.float32(2.2) if use_res else None,
    )
    got = fused_q1x1(
        x, layer, jnp.float32(3.7), jnp.float32(5.1), interpret=True, **kw
    )
    ref = xla_q1x1_reference(x, layer, jnp.float32(3.7), jnp.float32(5.1), **kw)
    assert got.dtype == jnp.int8 and got.shape == (b, h, w, n)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01, (diff > 0).mean()


def test_fused_q1x1_ragged_m_and_small_k():
    """M not a multiple of the tile height, and the trunk's narrow
    64-channel block1 operands."""
    rs = np.random.RandomState(1)
    b, h, w, k, n = 5, 5, 7, 64, 256  # M = 175, far off any tile multiple
    x = jnp.asarray(rs.randint(-127, 128, (b, h, w, k)), jnp.int8)
    layer = _layer(rs, k, n)
    got = fused_q1x1(
        x, layer, jnp.float32(1.3), jnp.float32(4.2), relu=True, interpret=True
    )
    ref = xla_q1x1_reference(
        x, layer, jnp.float32(1.3), jnp.float32(4.2), relu=True
    )
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def test_m_block_fits_budget():
    """The tile estimator must keep every trunk shape's working set
    under the VMEM budget and never degenerate below one MXU tile."""
    for k, n in [(64, 64), (64, 256), (256, 128), (128, 512),
                 (512, 128), (256, 1024), (1024, 256), (2048, 512),
                 (512, 2048)]:
        mb = _m_block(k, n)
        assert mb >= 128
        working = 2 * mb * k + k * n + 8 * n + 4 * mb * n + 4 * mb * n
        assert working <= 10 * 1024 * 1024, (k, n, mb)
    assert _m_block(128, 512) == 2048  # the on-chip-swept optimum
