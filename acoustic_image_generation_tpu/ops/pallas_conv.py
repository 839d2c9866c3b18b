"""Fused 3x3 conv-chain Pallas TPU kernels for the generator's hot layers.

The flagship cached train step is ~93% convolution fusions, and ~80% of
those FLOPs are the generator's stride-1 SAME 3x3 conv *pairs* at 36x48
(``UNetAcResNet`` layer1/layer6/layer7 — the ``conv_conv_pool`` pattern of
``/root/reference/models/unet_acresnet.py:136-170``). XLA schedules them at
~68% of bf16 FLOP peak / ~52% of HBM peak (docs/PERF.md trace table), and
its layer-at-a-time fusion materializes every intermediate activation
(~300 MB each at 768 frames) to HBM between convs, then re-reads them for
wgrad/dgrad/ReLU-gating on the backward pass.

This module fuses an entire conv->bias->ReLU chain into ONE Pallas kernel
(and the whole backward into one more), with the intermediate activations
of each grid block staying in VMEM:

- **Layout**: each (H, W) frame is zero-padded to (H+2, W+2) and flattened
  to a per-frame row vector of length L (rounded up to the bf16 sublane
  tile), so a 3x3 tap shift becomes a roll along the sublane axis and a
  conv becomes three MXU GEMMs with K = 3*C_in:
  ``out = sum_dy roll(A3, -(dy-1)*Wp) @ W3[dy]`` where
  ``A3 = [roll(x,+1) | x | roll(x,-1)]`` concatenates the three dx shifts
  along lanes. Interior outputs never read across frame boundaries
  (max |shift| = Wp+1 < 2*Wp), and the pad ring is re-zeroed after every
  conv, so cross-frame roll leakage only ever lands on masked rows.
- **Forward**: one kernel per chain; every activation a_i is written once
  (it is the backward residual) and read zero times on the forward pass.
- **Backward**: one kernel computes, per layer from last to first, the
  ReLU gate, the weight/bias grads (accumulated in f32 across grid steps
  into a VMEM-resident output block), and the data grad
  (``g_{i-1} = sum_dy roll(G3, +(dy-1)*Wp) @ W3T[dy]``), without ever
  materializing an intermediate cotangent to HBM.

Cost model: the padded-flat layout does L/(H*W) more MAC work
(~1.10x at 36x48); in exchange the GEMMs are large, aligned, and
K-deep (384/768), and the chain's inter-layer HBM round-trips vanish.

**Measured outcome (on-chip, round 3): XLA wins by 2-4x** — the fused
chain saves almost no HBM traffic (activations are backward residuals
and must be written regardless), and the roll/concat shift arithmetic
is VPU-bound and serializes against the MXU (27-35% MXU utilization vs
XLA's 68%). The kernel ships correct and tested (interpret-mode oracle
in ``tests/test_pallas_conv.py``, on-chip parity + timing table in
docs/PERF.md) behind ``ModelConfig.fused_conv`` (default off) as the
documented answer to whether hand-written conv kernels beat XLA on
these shapes: they do not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget per grid step (v5e has ~16 MB/core scoped vmem).
# The estimators below count every live buffer (double-buffered grid blocks,
# f32 roll temporaries, accumulators); the budget leaves headroom for Mosaic
# spill/copy temporaries the model can't see. Measured: the old 11 MB budget
# with a coarser model OOM'd at 16.14M/16M on the layer1 shapes.
_VMEM_BUDGET = 7 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _roll(x, shift: int):
    """Static roll along the sublane (row) axis of a 2D (S, C) array.

    Mosaic's rotate only handles 32-bit element types, so every roll in
    these kernels is placed on an f32 tensor (the accumulator or the
    cotangent) using the matmul/roll commutation rules
    ``roll(A, s) @ W == roll(A @ W, s)`` and
    ``roll(A, s)^T @ g == A^T @ roll(g, -s)``. ``pltpu.roll`` also only
    accepts non-negative shifts; a negative shift is the same rotation
    as ``shift mod S``.
    """
    assert x.dtype.itemsize == 4, "sublane roll must stay on 32-bit data"
    shift %= x.shape[0]
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis=0)


def _interior_mask(s: int, l: int, hp: int, wp: int, h: int, w: int):
    """(S, 1) mask of rows that are real (non-ring, non-tail-pad) pixels."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0) % l
    hh = pos // wp
    ww = pos % wp
    inside = (
        (hh >= 1) & (hh <= h) & (ww >= 1) & (ww <= w) & (pos < hp * wp)
    )
    return inside


def _dx_concat(x32, dtype):
    """A3 = [x shifted by dx-1 for dx in 0,1,2] along lanes: A3[p] rows are
    (x[p-1] | x[p] | x[p+1]). Built from the f32 tensor (rolls must be
    32-bit) and cast to the MXU compute dtype afterwards — elementwise
    identical to rolling the cast tensor."""
    return jnp.concatenate([_roll(x32, 1), x32, _roll(x32, -1)], axis=1).astype(
        dtype
    )


def _conv_from_a3(a3, w3_ref, wp: int):
    """sum_dy roll(A3, -(dy-1)*Wp) @ W3[dy], f32 accumulation.

    The dy roll is applied to the f32 *product* (roll commutes with a
    row-wise matmul), keeping the rotate on 32-bit data.
    """
    acc = None
    for dy in range(3):
        term = jax.lax.dot_general(
            a3,
            w3_ref[dy],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        term = _roll(term, -(dy - 1) * wp)
        acc = term if acc is None else acc + term
    return acc


# ------------------------------------------------------------------ forward


def _fwd_kernel(nb, l, hp, wp, h, w, relu, compute_dtype, x_ref, *refs):
    k = len(relu)
    w_refs = refs[:k]
    b_refs = refs[k : 2 * k]
    out_refs = refs[2 * k :]
    s = nb * l
    mask = _interior_mask(s, l, hp, wp, h, w)
    cur32 = x_ref[:].reshape(s, x_ref.shape[-1]).astype(jnp.float32)
    for i in range(k):
        a3 = _dx_concat(cur32, compute_dtype)
        acc = _conv_from_a3(a3, w_refs[i], wp)
        acc = acc + b_refs[i][:]
        if relu[i]:
            acc = jnp.maximum(acc, 0.0)
        acc = jnp.where(mask, acc, 0.0)
        out_refs[i][:] = acc.astype(compute_dtype).reshape(nb, l, acc.shape[-1])
        cur32 = acc


# ----------------------------------------------------------------- backward


def _bwd_kernel(
    nb, l, hp, wp, h, w, relu, compute_dtype, x_ref, *refs
):
    """One kernel for the whole chain backward.

    refs layout: w3[k], w3t[k], a[k] (fwd activations), g (cotangent of
    a_k), outputs: dw3[k], db[k], dx.
    """
    k = len(relu)
    w3_refs = refs[:k]
    w3t_refs = refs[k : 2 * k]
    a_refs = refs[2 * k : 3 * k]
    g_ref = refs[3 * k]
    dw_refs = refs[3 * k + 1 : 4 * k + 1]
    db_refs = refs[4 * k + 1 : 5 * k + 1]
    dx_ref = refs[5 * k + 1]

    s = nb * l
    first = pl.program_id(0) == 0

    g = g_ref[:].reshape(s, g_ref.shape[-1]).astype(jnp.float32)
    mask = _interior_mask(s, l, hp, wp, h, w)
    for i in range(k - 1, -1, -1):
        a_i = a_refs[i][:].reshape(s, a_refs[i].shape[-1])
        if relu[i]:
            # a_i = relu(y)*mask, so (a_i > 0) == (y > 0) & mask: one gate
            # applies both the ReLU derivative and the ring-grad drop.
            # (Compare in f32 — Mosaic has no bf16 vector compare.)
            g = jnp.where(a_i.astype(jnp.float32) > 0, g, 0.0)
        else:
            g = jnp.where(mask, g, 0.0)

        # ---- weight grad: dW3[dy] = roll(A3_{i-1}, -(dy-1)Wp)^T @ g
        #                           = A3_{i-1}^T @ roll(g, +(dy-1)Wp)
        # (transpose flips the roll onto the f32 cotangent).
        prev32 = (
            x_ref[:].reshape(s, x_ref.shape[-1])
            if i == 0
            else a_refs[i - 1][:].reshape(s, a_refs[i - 1].shape[-1])
        ).astype(jnp.float32)
        a3 = _dx_concat(prev32, compute_dtype)
        for dy in range(3):
            g_dy = _roll(g, (dy - 1) * wp).astype(compute_dtype)
            contrib = jax.lax.dot_general(
                a3,
                g_dy,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(first)
            def _():
                dw_refs[i][dy] = contrib

            @pl.when(jnp.logical_not(first))
            def _():
                dw_refs[i][dy] += contrib

        dbc = jnp.sum(g, axis=0, keepdims=True)

        @pl.when(first)
        def _():
            db_refs[i][:] = dbc

        @pl.when(jnp.logical_not(first))
        def _():
            db_refs[i][:] += dbc

        # ---- data grad: g_{i-1} = sum_dy roll(G3, +(dy-1)Wp) @ W3T[dy]
        #               = sum_dy roll(G3 @ W3T[dy], +(dy-1)Wp)  (f32 roll)
        g3 = _dx_concat(g, compute_dtype)  # [g[p-1] | g[p] | g[p+1]]
        acc = None
        for dy in range(3):
            term = jax.lax.dot_general(
                g3,
                w3t_refs[i][dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            term = _roll(term, (dy - 1) * wp)
            acc = term if acc is None else acc + term
        g = acc
    dx_ref[:] = g.astype(compute_dtype).reshape(nb, l, g.shape[-1])


# ------------------------------------------------------------------ packing


def _pack_w3(w, dtype):
    """(3,3,Ci,Co) HWIO -> (3, 3*Ci, Co): W3[dy] = rows [w[dy,0];w[dy,1];w[dy,2]].

    Lane-group order must match _dx_concat: A3's lane group j holds
    x[p + j - 1] = the dx=j tap operand, so W3[dy] row-group j is w[dy, j].
    """
    ci, co = w.shape[2], w.shape[3]
    return w.astype(dtype).transpose(0, 1, 2, 3).reshape(3, 3 * ci, co)


def _pack_w3t(w, dtype):
    """(3,3,Ci,Co) -> (3, 3*Co, Ci) for the transposed (data-grad) conv.

    dgrad: dx[q] = sum_{dy,dx} g[q - (dy-1)Wp - (dx-1)] w[dy,dx]^T. The
    kernel's dy-term operand is roll(G3, +(dy-1)Wp), whose lane group j
    holds g[q - (dy-1)Wp + (j-1)]; matching -(dx-1) = +(j-1) gives
    dx = 2 - j, while the dy index lines up directly (the roll sign
    already encodes the mirror). So W3T[dy] row-group j = w[dy, 2-j]^T.
    """
    wt = jnp.swapaxes(w.astype(dtype), 2, 3)  # (3,3,Co,Ci)
    wt = wt[:, ::-1]  # mirror dx only: [dy, 2-dx]
    co, ci = wt.shape[2], wt.shape[3]
    return wt.reshape(3, 3 * co, ci)


def _weights_bytes(chans: list[int], itemsize: int, *, transposed: bool) -> int:
    """Fixed (grid-constant) VMEM for the packed W3 (+W3T) operands."""
    per = sum(3 * 3 * ci * co for ci, co in zip(chans[:-1], chans[1:]))
    return per * itemsize * (2 if transposed else 1)


def _fwd_row_bytes(chans: list[int], itemsize: int) -> int:
    """Per-(S-row) live bytes of the forward kernel: double-buffered input
    block, double-buffered output blocks, cur32 (f32), the widest A3 (three
    lane-concatenated dx shifts + their f32 roll temporaries), one f32 acc."""
    c0, outs, cm = chans[0], sum(chans[1:]), max(chans)
    return (
        2 * itemsize * c0  # x block, double-buffered
        + 2 * itemsize * outs  # activation outputs, double-buffered
        + 4 * cm  # cur32
        + 3 * itemsize * cm  # A3 (compute dtype)
        + 2 * 4 * cm  # f32 roll temporaries feeding A3
        + 4 * max(chans[1:])  # f32 accumulator
    )


def _bwd_row_bytes(chans: list[int], itemsize: int) -> int:
    """Per-row live bytes of the fused backward: x + every activation +
    the incoming cotangent (all double-buffered grid blocks), dx output,
    prev32/a3 and g/g3 temporaries with their f32 rolls, f32 acc."""
    c0, ck, cm = chans[0], chans[-1], max(chans)
    return (
        2 * itemsize * c0  # x block
        + 2 * itemsize * sum(chans[1:])  # forward activations
        + 2 * itemsize * ck  # cotangent block
        + 2 * itemsize * c0  # dx output block
        + 4 * cm  # prev32
        + 3 * itemsize * cm  # a3
        + 4 * cm  # g (f32)
        + 3 * itemsize * cm  # g3
        + 3 * 4 * cm  # f32 roll temporaries (dy rolls of g / products)
        + 4 * cm  # f32 acc for the data grad
    )


def _choose_nb(
    n: int,
    l: int,
    chans: list[int],
    itemsize: int = 2,
    *,
    backward: bool = False,
) -> int:
    """Largest per-step frame count whose working set fits the budget."""
    row = (_bwd_row_bytes if backward else _fwd_row_bytes)(chans, itemsize)
    fixed = _weights_bytes(chans, itemsize, transposed=backward)
    if backward:
        # f32 dW3/db accumulators live in VMEM across the whole grid
        fixed += sum(
            3 * 3 * ci * co * 4 + co * 4
            for ci, co in zip(chans[:-1], chans[1:])
        )
    for nb in (16, 8, 4, 2, 1):
        if n % nb:
            continue
        if nb * l * row + fixed <= _VMEM_BUDGET:
            return nb
    return 1


def _flatten_pad(x, h: int, w: int, l: int):
    """(N, H, W, C) -> zero-padded per-frame flat rows (N, L, C)."""
    n, c = x.shape[0], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, (h + 2) * (w + 2), c)
    if l > (h + 2) * (w + 2):
        xp = jnp.pad(xp, ((0, 0), (0, l - (h + 2) * (w + 2)), (0, 0)))
    return xp


def _unflatten(yf, h: int, w: int):
    """(N, L, C) flat rows -> interior (N, H, W, C)."""
    n, c = yf.shape[0], yf.shape[-1]
    hp, wp = h + 2, w + 2
    y = yf[:, : hp * wp].reshape(n, hp, wp, c)
    return y[:, 1 : h + 1, 1 : w + 1, :]


# ---------------------------------------------------------------- entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_chain(x, weights, biases, relu=(True, True), interpret=False):
    """Fused chain of stride-1 SAME 3x3 convs: x -> conv+bias(+ReLU) x k.

    ``x``: (N, H, W, C0); ``weights[i]``: (3, 3, C_{i-1}, C_i) HWIO (any
    float dtype — cast to x.dtype for the MXU); ``biases[i]``: (C_i,).
    ``relu[i]`` applies ReLU after conv i. Returns (N, H, W, C_k) in
    x.dtype. Differentiable w.r.t. x, weights, biases (grads in f32 for
    params, x.dtype for x) via the fused backward kernel.
    """
    y, _ = _conv_chain_fwd(x, weights, biases, relu, interpret)
    return y


def _conv_chain_fwd(x, weights, biases, relu, interpret):
    n, h, w, c0 = x.shape
    k = len(weights)
    assert len(biases) == k and len(relu) == k
    chans = [c0] + [wi.shape[-1] for wi in weights]
    dt = x.dtype
    hp, wp = h + 2, w + 2
    l = _round_up(hp * wp, 16)
    nb = _choose_nb(n, l, chans)

    xf = _flatten_pad(x, h, w, l)
    w3 = [_pack_w3(wi, dt) for wi in weights]
    b2 = [bi.astype(jnp.float32).reshape(1, -1) for bi in biases]

    grid = (n // nb,)
    in_specs = (
        [pl.BlockSpec((nb, l, c0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * k)
    )
    out_specs = [
        pl.BlockSpec((nb, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for c in chans[1:]
    ]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, nb, l, hp, wp, h, w, tuple(relu), dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n, l, c), dt) for c in chans[1:]
        ],
        interpret=interpret,
    )(xf, *w3, *b2)
    y = _unflatten(outs[-1], h, w)
    return y, (xf, tuple(outs), tuple(weights), (n, h, w))


def _conv_chain_bwd(relu, interpret, res, gy):
    xf, acts, weights, (n, h, w) = res
    k = len(weights)
    dt = xf.dtype
    hp, wp = h + 2, w + 2
    l = xf.shape[1]
    chans = [xf.shape[-1]] + [wi.shape[-1] for wi in weights]
    nb = _choose_nb(n, l, chans, backward=True)

    gf = _flatten_pad(gy.astype(dt), h, w, l)
    w3 = [_pack_w3(wi, dt) for wi in weights]
    w3t = [_pack_w3t(wi, dt) for wi in weights]

    grid = (n // nb,)
    vmem = pltpu.VMEM
    in_specs = (
        [pl.BlockSpec((nb, l, chans[0]), lambda i: (i, 0, 0), memory_space=vmem)]
        + [pl.BlockSpec(memory_space=vmem)] * (2 * k)
        + [
            pl.BlockSpec((nb, l, c), lambda i: (i, 0, 0), memory_space=vmem)
            for c in chans[1:]
        ]
        + [pl.BlockSpec((nb, l, chans[-1]), lambda i: (i, 0, 0), memory_space=vmem)]
    )
    # dW/db accumulate across the (sequential) grid into one block
    out_specs = (
        [
            pl.BlockSpec((3, 3 * ci, co), lambda i: (0, 0, 0), memory_space=vmem)
            for ci, co in zip(chans[:-1], chans[1:])
        ]
        + [pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=vmem) for c in chans[1:]]
        + [pl.BlockSpec((nb, l, chans[0]), lambda i: (i, 0, 0), memory_space=vmem)]
    )
    out_shape = (
        [
            jax.ShapeDtypeStruct((3, 3 * ci, co), jnp.float32)
            for ci, co in zip(chans[:-1], chans[1:])
        ]
        + [jax.ShapeDtypeStruct((1, c), jnp.float32) for c in chans[1:]]
        + [jax.ShapeDtypeStruct((n, l, chans[0]), dt)]
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nb, l, hp, wp, h, w, tuple(relu), dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xf, *w3, *w3t, *acts, gf)
    dw3 = outs[:k]
    db = [d.reshape(-1) for d in outs[k : 2 * k]]
    dxf = outs[2 * k]
    # unpack dW3 (3, 3Ci, Co) -> (3, 3, Ci, Co) f32, matching _pack_w3
    dws = [
        d.reshape(3, 3, ci, co)
        for d, ci, co in zip(dw3, chans[:-1], chans[1:])
    ]
    dx = _unflatten(dxf, h, w)
    return dx, tuple(dws), tuple(db)


conv_chain.defvjp(_conv_chain_fwd, _conv_chain_bwd)


# -------------------------------------------------------------- dispatch


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False


def conv_chain_auto(x, weights, biases, relu):
    """``conv_chain`` on TPU backends, the XLA oracle elsewhere.

    The two paths share dtype discipline (bf16 operands, f32 accumulate /
    bias / ReLU, bf16 inter-layer), so flipping backends changes results
    only by MXU summation order. CPU tests of models with the fused flag
    on exercise this fallback; the kernel itself is oracle-tested in
    interpret mode (tests/test_pallas_conv.py).
    """
    if _tpu_backend():
        return conv_chain(x, tuple(weights), tuple(biases), tuple(relu))
    return conv_chain_reference(x, weights, biases, relu)


# ----------------------------------------------------------------- oracle


def conv_chain_reference(x, weights, biases, relu=(True, True)):
    """Plain-XLA oracle with identical dtype discipline (tests + the
    fallback path when the Pallas kernels are disabled).

    Operands are staged through the compute dtype (the rounding points
    the kernel has) but the conv itself contracts f32->f32 — each
    bf16*bf16 product is exact in f32, so this matches the kernel's
    f32-accumulating MXU path while keeping the op differentiable
    (mixed-dtype conv_general_dilated has no JVP/transpose rule).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    cur = x
    for wi, bi, r in zip(weights, biases, relu):
        y = jax.lax.conv_general_dilated(
            cur.astype(x.dtype).astype(jnp.float32),
            wi.astype(x.dtype).astype(jnp.float32),
            (1, 1),
            "SAME",
            dimension_numbers=dn,
        )
        y = y + bi.astype(jnp.float32)
        if r:
            y = jnp.maximum(y, 0.0)
        cur = y.astype(x.dtype)
    return cur
