"""Pallas TPU kernel: 1x1 conv (GEMM) with fused batch-norm statistics.

Train-mode batch norm needs the per-channel mean/variance of the conv's own
output before anything can consume it. XLA schedules that as the conv
writing its output to HBM and a *separate* reduction kernel re-reading all
of it — measured on a v5e: a (3.2M, 128) @ (128, 512) GEMM + BN costs
23.2 ms in train mode vs 12.5 ms in eval mode, and the trunk forward of
the flagship pays ~79 ms/step of exactly this (296 ms train-BN vs 217 ms
eval-BN at 768 frames).

This kernel accumulates per-channel sum and sum-of-squares *in the GEMM's
epilogue* while the output tile is still in VMEM, eliminating the extra
HBM read pass. The 1x1 convs of the ResNet bottleneck units (conv1/conv3
and the projection shortcuts — the bulk of the trunk's output bytes) are
plain GEMMs over (B*H*W, C), so they all qualify.

Used by ``models.resnet._ConvBN`` when ``fused_bn_stats`` is on.

STATUS — measured NEGATIVE result (v5e, 48-clip flagship step): 75.3
clips/s fused vs 181.9 plain. This single-level-blocked GEMM (full-K
tiles, m-minor streaming) loses far more to XLA's highly tuned GEMM
emitter than the eliminated stats read pass saves (~10 ms per large
conv), and the now-unfused normalize pass adds peak-HBM pressure (64-clip
batches OOM). Kept off by default as a correct, tested baseline; a
competitive version needs k-tiled accumulator scratch and n-major input
reuse. The measured headroom it targets is real: GEMM+BN train 23.2 ms vs
eval 12.5 ms at (3.2M,128)@(128,512).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TM = 512  # rows (batch*spatial) per tile
TN = 512  # output channels per tile (N < TN handled as a single block)


def _kernel(x_ref, w_ref, y_ref, s_ref, ss_ref):
    from jax.experimental import pallas as pl

    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)

    # the stats blocks are revisited across the (minor) m axis: zero them
    # on the first visit, then accumulate this row-tile's channel sums
    @pl.when(pl.program_id(1) == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        ss_ref[:] = jnp.zeros_like(ss_ref)

    s_ref[0, :] += jnp.sum(y, axis=0)
    ss_ref[0, :] += jnp.sum(y * y, axis=0)


def matmul_stats(
    x: jnp.ndarray,  # (M, K)
    w: jnp.ndarray,  # (K, N)
    *,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-pass ``y = x @ w`` plus per-column sum / sum-of-squares.

    Returns ``(y (M,N) in x.dtype, sum (N,) f32, sumsq (N,) f32)``; the
    sums are over the M rows of the *unpadded* input (zero padding rows
    contribute nothing). VMEM per step: x (TM,K<=2048) bf16 2 MB + w
    (K,TN) 2 MB + y f32 1 MB — well under 16 MB.

    Differentiable: a custom JVP expresses the tangents as plain XLA
    matmuls, so linearization works even though pallas_call has no AD
    rule. In the frozen-trunk flagship the tangents die at the
    stop_gradient and XLA removes them entirely.
    """
    if interpret is None:
        return _matmul_stats(x, w)
    return _matmul_stats_raw(x, w, interpret)


@jax.custom_jvp
def _matmul_stats(x, w):
    return _matmul_stats_raw(x, w, jax.default_backend() != "tpu")


@_matmul_stats.defjvp
def _matmul_stats_jvp(primals, tangents):
    x, w = primals
    dx, dw = tangents
    y, s, ss = _matmul_stats(x, w)
    dy = (
        jnp.dot(dx, w, preferred_element_type=jnp.float32)
        + jnp.dot(x, dw, preferred_element_type=jnp.float32)
    )
    ds = jnp.sum(dy, axis=0)
    dss = jnp.sum(2.0 * y.astype(jnp.float32) * dy, axis=0)
    return (y, s, ss), (dy.astype(y.dtype), ds, dss)


def _matmul_stats_raw(x, w, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    n = w.shape[1]
    tn = TN if n % TN == 0 else n
    m_pad = -m % TM
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    gm, gn = x.shape[0] // TM, n // tn

    # grid (n, m) with m MINOR: consecutive steps revisit the same stats
    # block, which therefore stays resident in VMEM while the m tiles
    # stream through (the standard Pallas reduction pattern). Stats blocks
    # are (8, tn) to satisfy the sublane tile minimum; row 0 carries data.
    y, s, ss = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], n), x.dtype),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
        ),
        grid=(gn, gm),
        in_specs=[
            pl.BlockSpec((TM, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TM, tn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, w)
    if m_pad:
        y = y[:m]
    return y, s[0], ss[0]


def conv1x1_batch_stats(x: jnp.ndarray, kernel: jnp.ndarray):
    """(B, H, W, Cin) x (1, 1, Cin, Cout) -> (y, batch mean (Cout,),
    biased batch var (Cout,)) — the fast-variance stats flax BatchNorm
    computes, without the extra HBM read pass."""
    b, h, w_, cin = x.shape
    cout = kernel.shape[-1]
    m = b * h * w_
    y, s, ss = matmul_stats(x.reshape(m, cin), kernel.reshape(cin, cout))
    mean = s / m
    var = jnp.maximum(ss / m - mean * mean, 0.0)
    return y.reshape(b, h, w_, cout), mean, var
