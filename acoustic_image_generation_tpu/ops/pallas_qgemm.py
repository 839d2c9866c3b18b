"""Fused int8 1x1-conv (GEMM) Pallas kernels for the quantized trunk.

Round 2's device traces named two Pallas targets (docs/PERF.md): (a) the
cached step's 3x3 conv chains — attempted in round 3, XLA won 2-4x for
structural reasons (the shift arithmetic serializes on the VPU) — and
(b) the int8 trunk's 1x1 convs, e.g. the block2 expand convs
(s8[768,55,74,512] outputs, 3.6 GB / 8.2 ms each ≈ 439 GB/s, ~54% of
v5e HBM peak). This module is the real attempt at (b).

A 1x1 stride-1 conv IS a GEMM over the channel dimension — none of the
3x3 kernel's fatal shift arithmetic applies. The quantized trunk
(models/quant.py, reference trunk semantics from
``/root/reference/models/resnet50.py:205-219`` with every BatchNorm
folded into its conv) runs every bottleneck ``conv1``/``conv3``/
``shortcut`` as ``s8 x s8 -> s32`` with a fused
dequant+bias(+residual)+ReLU+requant epilogue, so each inter-layer
tensor exists in HBM only as int8. XLA already fuses that epilogue; the
headroom is purely the GEMM *schedule's* achieved bandwidth. The kernel
here is a streaming GEMM:

- grid over M = N*H*W row blocks; the full weight panel (K x N s8, at
  most 1 MB) plus the f32 factor/bias rows live VMEM-resident across
  the grid (their index maps are constant, so Mosaic keeps one copy);
- per block: DMA (M_blk, K) s8 in, one MXU pass, epilogue in registers,
  DMA (M_blk, N) s8 out — the kernel reads/writes EXACTLY the bytes the
  algorithm requires, all int8;
- the dot runs natively as ``s8 x s8 -> s32`` on the MXU
  (``preferred_element_type=int32``) — measured 13x faster than
  upcasting the operands to bf16 in-register (the casts are VPU work on
  the GEMM's critical path);
- the requant scale ``127/out_amax`` is folded into the f32
  factor/bias/residual coefficients on the host, saving one full-width
  VPU multiply per element (measured ~16%).

Epilogue semantics match models/quant.py's XLA path up to f32 rounding
order: ``y = acc*factor' + bias' (+ residual*res') ; relu ;
clip(round(y), -127, 127) -> s8`` where the primed coefficients carry
the folded requant scale. Folding reorders two f32 roundings, so fused
outputs may differ from the XLA path by at most one int8 quantum
(bounded in tests/test_pallas_qgemm.py).

The trunk is frozen (``/root/reference/models/vision.py:68-71`` — no
trainer ever updates it), so this is a forward-only kernel: no vjp.

Measured on-chip verdict and the ``trunk_fused_gemm`` wiring live in
docs/PERF.md; models/quant.py switches per-site via ``fused_gemm=``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _m_block(k: int, n: int) -> int:
    """M tile height: keep the per-step VMEM working set (double-buffered
    x/out/residual blocks + resident weights + s32/f32 accumulator) well
    under the ~16 MB/core budget. N-heavy layers get shorter tiles
    because the accumulator and s8 out/residual blocks scale with N.
    Swept on-chip (docs/PERF.md): taller tiles win while they fit
    (mb=2048 beat 1024 beat 512 on the block2 expand shape)."""
    for mb in (2048, 1024, 512, 256, 128):
        working = (
            2 * mb * k            # x blocks (s8, double-buffered)
            + k * n               # resident weights (s8)
            + 8 * n               # factor/bias rows (f32)
            + 2 * 2 * mb * n      # out + residual blocks (s8, 2 buffers)
            + 4 * mb * n          # accumulator (s32/f32)
        )
        if working <= 10 * 1024 * 1024:
            return mb
    return 128


def _qgemm_kernel(scale_ref, x_ref, w_ref, fb_ref, *rest, relu, has_residual):
    if has_residual:
        res_ref, out_ref = rest
    else:
        (out_ref,) = rest
    acc = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    # fb rows and scale_ref[0] carry the folded requant scale (see
    # module docstring)
    y = acc * fb_ref[0:1, :] + fb_ref[1:2, :]
    if has_residual:
        y = y + res_ref[:].astype(jnp.float32) * scale_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    q = jnp.clip(jnp.round(y), -127.0, 127.0)
    out_ref[:] = q.astype(jnp.int8)


def qgemm_s8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    factor: jnp.ndarray,
    bias: jnp.ndarray,
    out_amax: jnp.ndarray,
    *,
    relu: bool,
    residual: jnp.ndarray | None = None,
    residual_amax: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused ``s8[M,K] @ s8[K,N]`` + dequant/bias(+residual)/ReLU/requant.

    Args:
      x: int8 activations, shape (M, K).
      w: int8 weights, shape (K, N).
      factor: f32 per-output-channel dequant factor ``(a_amax/127)*w_scale``.
      bias: f32 folded-BN bias per output channel.
      out_amax: f32 scalar static activation amax of the OUTPUT site; the
        result is ``clip(round(y*127/out_amax))`` as int8.
      relu: apply ReLU before requantization.
      residual: optional int8 (M, N) stream added (dequantized by
        ``residual_amax/127``) before the ReLU — the bottleneck
        shortcut-add fused in.
      interpret: run in Pallas interpreter mode. Default (None) =
        interpret everywhere except on a real TPU backend, so the fused
        trunk path stays runnable (slowly) in CPU tests.

    Returns int8 (M, N).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    has_residual = residual is not None
    if has_residual:
        assert residual.shape == (m, n), (residual.shape, (m, n))
        assert residual_amax is not None
    mb = _m_block(k, n)
    grid = (pl.cdiv(m, mb),)
    out_scale = 127.0 / jnp.maximum(out_amax.astype(jnp.float32), 1e-12)
    # fold the requant scale into every epilogue coefficient
    fb = jnp.stack(
        [
            factor.astype(jnp.float32) * out_scale,
            bias.astype(jnp.float32) * out_scale,
        ]
    )
    res_scale = (
        residual_amax.astype(jnp.float32) / 127.0 * out_scale
        if has_residual
        else jnp.float32(0.0)
    )
    scales = jnp.stack([res_scale, jnp.float32(0.0)])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((mb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [scales, x, w, fb]
    if has_residual:
        in_specs.append(
            pl.BlockSpec((mb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    kernel = functools.partial(
        _qgemm_kernel, relu=relu, has_residual=has_residual
    )
    res_bytes = m * n if has_residual else 0
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k * n + m * n + res_bytes + 8 * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def fused_q1x1(
    x: jnp.ndarray,
    layer: dict,
    a_amax: jnp.ndarray,
    out_amax: jnp.ndarray,
    *,
    relu: bool,
    residual: jnp.ndarray | None = None,
    residual_amax: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """NHWC wrapper over :func:`qgemm_s8` for a quantized-trunk 1x1
    stride-1 layer (``models/quant.py`` ``_qlayer`` dict: int8 HWIO
    ``w`` (1,1,K,N), f32 ``scale`` (N,), f32 ``bias`` (N,)).

    ``x`` is the int8 NHWC stream quantized with ``a_amax``; the result
    is the int8 NHWC stream of the OUTPUT quantization site
    (``out_amax``), i.e. this one call covers what the XLA path spells
    as ``_qconv`` + (residual add) + ReLU + ``_quant_act``.
    """
    b, h, wd, k = x.shape
    kern = layer["w"]
    assert kern.shape[:2] == (1, 1), kern.shape
    n = kern.shape[3]
    factor = (a_amax.astype(jnp.float32) / 127.0) * layer["scale"].astype(
        jnp.float32
    )
    res2d = residual.reshape(b * h * wd, n) if residual is not None else None
    out = qgemm_s8(
        x.reshape(b * h * wd, k),
        kern.reshape(k, n),
        factor,
        layer["bias"],
        out_amax,
        relu=relu,
        residual=res2d,
        residual_amax=residual_amax,
        interpret=interpret,
    )
    return out.reshape(b, h, wd, n)


def xla_q1x1_reference(
    x, layer, a_amax, out_amax, *, relu, residual=None, residual_amax=None
):
    """The XLA twin of :func:`fused_q1x1`, composed from models/quant.py's
    OWN ``_qconv``/``_quant_act`` helpers so the oracle can never drift
    from the production epilogue semantics — the baseline for the tests
    and the on-chip timing comparison."""
    from acoustic_image_generation_tpu.models.quant import _qconv, _quant_act

    y = _qconv(x, a_amax.astype(jnp.float32), layer, 1, fixed_pad=False)
    if residual is not None:
        y = y + residual.astype(jnp.float32) * (
            residual_amax.astype(jnp.float32) / 127.0
        )
    if relu:
        y = jnp.maximum(y, 0.0)
    q, _ = _quant_act(y, out_amax, "oracle", False, {})
    return q
