"""Int8 (W8A8) inference path for the frozen ResNet trunk.

The reference never trains the visual backbone — every trainer's
``var_list`` is the UNet + conv_map/logits heads only
(``/root/reference/models/vision.py:68-71``,
``/root/reference/trainer/mfcctrainer.py:64``) — so in the flagship
generation step the trunk is a *fixed* feature extractor whose forward
pass dominates both FLOPs and HBM traffic (docs/PERF.md: 24.2 of the
31.0 TFLOP and 116 of 194 GB per 64-clip step). On TPU v5e the MXU
runs int8 at twice the bf16 rate and int8 activations/weights halve the
HBM traffic, so a quantized trunk roughly doubles the roofline of the
uncached train step while leaving every *trainable* tensor (conv_map,
generator, losses, optimizer) in full precision.

Design (standard production post-training quantization, TPU-native):

- **BN folding**: with ``trunk_bn="frozen"`` every trunk BatchNorm is an
  affine function of fixed running stats, so it folds into the preceding
  conv: ``W' = W * gamma/sqrt(var+eps)`` per output channel,
  ``b' = beta - mean * gamma/sqrt(var+eps)``. The folded trunk is
  numerically identical to the eval-BN trunk (tested to f32 tolerance).
- **Weights**: symmetric per-output-channel int8 (amax/127 scales),
  prepacked once per run from the (frozen) f32 params.
- **Activations**: symmetric per-tensor int8 with *static* scales from a
  one-batch calibration pass. Static scales let XLA fuse the
  quantize (scale+round+clip+cast) into the producing conv's epilogue,
  so inter-layer tensors are written to and read from HBM as int8 —
  dynamic (per-batch amax) quantization would force an extra full read
  of every activation on this HBM-bound path.
- Convs run ``s8 x s8 -> s32`` on the MXU via
  ``lax.conv_general_dilated(..., preferred_element_type=int32)``; the
  dequant epilogue applies ``(a_amax/127)*(w_amax/127)`` and the folded
  bias in f32, then ReLU, then bf16 for the residual adds.

The quantized trunk output feeds the same ``mode="head"`` path as the
feature cache (models/resnet.py), so conv_map/logits BN statistics and
gradients are untouched. Because the generator *trains against* the
quantized features, small systematic quantization error is absorbed by
the trainable head — validated end-to-end in tests/test_quant.py.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp

from acoustic_image_generation_tpu.ops.tf_compat import conv2d_same_fixed_pad

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-5


# --------------------------------------------------------------------- fold


def fold_conv_bn(conv_tree: dict, stats_tree: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold a frozen BatchNorm into its preceding conv.

    ``conv_tree`` is one ``_ConvBN`` param subtree (models/resnet.py):
    kernel at ``["conv"]["kernel"]`` (nn.Conv) or ``["kernel"]``
    (fixed-pad convs), BN affine at ``["BatchNorm"]``; ``stats_tree``
    holds the matching running ``mean``/``var``. Returns
    ``(folded_kernel_f32, bias_f32)``.
    """
    kernel = conv_tree["kernel"] if "kernel" in conv_tree else conv_tree["conv"]["kernel"]
    gamma = conv_tree["BatchNorm"]["scale"].astype(jnp.float32)
    beta = conv_tree["BatchNorm"]["bias"].astype(jnp.float32)
    mean = stats_tree["BatchNorm"]["mean"].astype(jnp.float32)
    var = stats_tree["BatchNorm"]["var"].astype(jnp.float32)
    s = gamma * jax.lax.rsqrt(var + _BN_EPS)
    return kernel.astype(jnp.float32) * s, beta - mean * s


def _quantize_kernel(kernel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: HWIO kernel -> (int8, scale[O])."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qlayer(conv_tree: dict, stats_tree: dict) -> dict:
    kernel, bias = fold_conv_bn(conv_tree, stats_tree)
    w, scale = _quantize_kernel(kernel)
    return {"w": w, "scale": scale, "bias": bias}


def quantize_trunk(resnet_params: dict, resnet_stats: dict) -> dict:
    """Prepack the frozen trunk (conv1 + every bottleneck) to int8.

    Activation scales start at 1.0 placeholders — run :func:`calibrate`
    before using the result for inference. ``conv_map``/``logits`` stay
    out: they are trainable (vision.py:70) and remain full precision.
    """
    qt: dict = {"conv1": _qlayer(resnet_params["conv1"], resnet_stats["conv1"])}
    act: dict = {"input": jnp.float32(1.0), "stem_out": jnp.float32(1.0)}
    for name in resnet_params:
        if not name.startswith("block"):
            continue
        p, s = resnet_params[name], resnet_stats[name]
        unit = {c: _qlayer(p[c], s[c]) for c in ("conv1", "conv2", "conv3")}
        if "shortcut" in p:
            unit["shortcut"] = _qlayer(p["shortcut"], s["shortcut"])
            act[f"{name}/sc"] = jnp.float32(1.0)
        qt[name] = unit
        act[f"{name}/c2"] = jnp.float32(1.0)
        act[f"{name}/c3"] = jnp.float32(1.0)
        act[f"{name}/out"] = jnp.float32(1.0)
    qt["act"] = act
    return qt


# ------------------------------------------------------------------ forward


def _unit_names(blocks) -> list[tuple[str, int]]:
    """(unit name, stride) in execution order for a blocks config
    ((base_depth, num_units, block_stride) per block, models/resnet.py)."""
    out = []
    for b, (_, num_units, block_stride) in enumerate(blocks, start=1):
        for u in range(1, num_units + 1):
            stride = block_stride if u == num_units else 1
            out.append((f"block{b}_unit_{u}", stride))
    return out


def _quant_act(x, amax, site, collect, observed):
    """Quantize an activation at a named site. In ``collect`` mode the
    scale is the tensor's own amax (dynamic) and is recorded."""
    if collect:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        observed[site] = amax
    amax = jnp.maximum(amax, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / amax)), -127, 127)
    return q.astype(jnp.int8), amax


def _qconv(xq, a_amax, layer, stride: int, *, fixed_pad: bool, padding: str = "SAME"):
    """int8 conv + dequant + folded bias, f32 result."""
    if fixed_pad:
        y = conv2d_same_fixed_pad(
            xq, layer["w"], stride, preferred_element_type=jnp.int32
        )
    else:
        y = lax.conv_general_dilated(
            xq,
            layer["w"],
            (stride, stride),
            padding,
            dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
    factor = (a_amax / 127.0) * layer["scale"]
    return y.astype(jnp.float32) * factor + layer["bias"]


def trunk_forward(
    qt: dict,
    x: jnp.ndarray,
    blocks,
    *,
    collect: bool = False,
    out_dtype=jnp.bfloat16,
    fused_gemm: bool = False,
):
    """Quantized trunk forward: normalized video (N,224,298,3) in [0,1]
    -> block4 features at the stop_gradient boundary (N,14,19,2048).

    Mirrors ``ResNet50.__call__(mode="trunk")`` (models/resnet.py) over
    the folded int8 layers. ``collect=True`` runs with dynamic per-tensor
    scales and returns the observed amaxes for :func:`calibrate`.
    Returns ``(features, observed_amaxes)``.

    HBM discipline — the point of the whole exercise (the trunk is
    HBM-bound at bf16, docs/PERF.md): every inter-layer tensor is
    materialized ONLY as int8. Each conv's dequant+bias+ReLU+requantize
    epilogue is a pure elementwise chain XLA fuses into the conv output,
    so the f32 intermediates never hit HBM; residual adds read the int8
    stream through fused dequants; the stem max-pool runs directly on
    int8 (max commutes with the monotone quantization map); projection
    shortcuts are quantized so their (wide) outputs also store as int8.
    A first draft that kept the residual stream in bf16 measured *zero*
    end-to-end win — XLA cost analysis showed 123 GB accessed vs 117 GB
    for the bf16 trunk, because every activation was written twice
    (bf16 + int8) and the int8 MXU's 1.5x kernel rate can't pay for
    extra traffic on an HBM-bound program.

    ``fused_gemm=True`` (static-scale mode only) routes every 1x1
    stride-1 conv — all bottleneck ``conv1``/``conv3``/``shortcut``
    layers; every shortcut is stride-1 because the reference strides the
    LAST unit of a block through conv2 — through the Pallas streaming
    GEMM of ops/pallas_qgemm.py, which fuses the conv, dequant, bias,
    shortcut add, ReLU and requant into one kernel (int8 in, int8 out).
    The 3x3 conv2 layers and the stem stay on XLA. Outputs may differ
    from the XLA path by <=1 int8 quantum (the fused epilogue folds the
    requant scale into factor/bias, reordering two f32 roundings).
    """
    act = qt["act"]
    observed: dict = {}
    use_fused = fused_gemm and not collect
    if use_fused:
        from acoustic_image_generation_tpu.ops.pallas_qgemm import fused_q1x1

    def qa(v, site):
        return _quant_act(v, act[site], site, collect, observed)

    def deq(q, amax):
        return q.astype(jnp.float32) * (amax / 127.0)

    xq, a = qa(x, "input")
    y = jnp.maximum(_qconv(xq, a, qt["conv1"], 2, fixed_pad=True), 0.0)
    yq, a = qa(y, "stem_out")
    # stem max-pool on the int8 stream (reduce_window max over int8)
    yq = jax.lax.reduce_window(
        yq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )
    for name, stride in _unit_names(blocks):
        unit = qt[name]
        if use_fused:
            # residual as an int8 stream + amax, consumed by conv3's kernel
            if "shortcut" in unit:
                # a strided 1x1 SAME conv reads only the subsampled grid,
                # so it IS the stride-1 GEMM over x[::stride] (strided
                # shortcuts occur in single-unit blocks, where the block
                # stride and the projection land on the same unit)
                sc_in = yq if stride == 1 else yq[:, ::stride, ::stride, :]
                resq = fused_q1x1(
                    sc_in, unit["shortcut"], a, act[f"{name}/sc"], relu=False
                )
                a_res = act[f"{name}/sc"]
            elif stride == 1:
                resq, a_res = yq, a
            else:
                resq, a_res = yq[:, ::stride, ::stride, :], a
            rq = fused_q1x1(yq, unit["conv1"], a, act[f"{name}/c2"], relu=True)
            a2 = act[f"{name}/c2"]
            r = jnp.maximum(
                _qconv(rq, a2, unit["conv2"], stride, fixed_pad=stride > 1), 0.0
            )
            rq, a3 = qa(r, f"{name}/c3")
            yq = fused_q1x1(
                rq, unit["conv3"], a3, act[f"{name}/out"],
                relu=True, residual=resq, residual_amax=a_res,
            )
            a = act[f"{name}/out"]
            continue
        if "shortcut" in unit:
            sc = _qconv(yq, a, unit["shortcut"], stride, fixed_pad=False)
            scq, a_sc = qa(sc, f"{name}/sc")
            shortcut = deq(scq, a_sc)
        elif stride == 1:
            shortcut = deq(yq, a)
        else:
            # identity subsample = 1x1 stride-s max-pool (resnet.py)
            shortcut = deq(yq[:, ::stride, ::stride, :], a)
        r = jnp.maximum(_qconv(yq, a, unit["conv1"], 1, fixed_pad=False), 0.0)
        rq, a2 = qa(r, f"{name}/c2")
        r = jnp.maximum(
            _qconv(rq, a2, unit["conv2"], stride, fixed_pad=stride > 1), 0.0
        )
        rq, a3 = qa(r, f"{name}/c3")
        r = _qconv(rq, a3, unit["conv3"], 1, fixed_pad=False)
        yq, a = qa(jnp.maximum(shortcut + r, 0.0), f"{name}/out")
    return deq(yq, a).astype(out_dtype), observed


def calibrate(qt: dict, video: jnp.ndarray, blocks) -> dict:
    """One-pass static calibration: run the trunk with dynamic scales on a
    representative batch of normalized frames and freeze the observed
    per-tensor amaxes as the activation scales."""
    _, observed = jax.jit(
        lambda q, v: trunk_forward(q, v, blocks, collect=True), static_argnums=()
    )(qt, video)
    return {**qt, "act": {k: jnp.float32(v) for k, v in observed.items()}}
