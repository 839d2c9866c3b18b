"""Fused 3x3 conv-chain kernel (ops/pallas_conv) against the XLA oracle.

Interpret mode off-TPU. Forward and data-grad are bit-exact vs the
dtype-disciplined oracle; weight/bias grads round the cotangent to the
compute dtype inside the fused backward (the oracle keeps it f32), so the
bf16 cases compare at bf16-rounding tolerance while the f32 cases are
tight. The chain shapes cover the flagship generator's hot layers
(``/root/reference/models/unet_acresnet.py:136-170`` conv_conv_pool pairs
at 36x48 and 12x16, including the 12-channel tiled-MFCC input and the
non-128-aligned 133-channel bottleneck).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acoustic_image_generation_tpu.ops import pallas_conv as pc


def _make_chain(rng, n, h, w, chans, dtype):
    x = jnp.asarray(rng.standard_normal((n, h, w, chans[0])), jnp.float32)
    x = x.astype(dtype)
    weights = tuple(
        jnp.asarray(
            rng.standard_normal((3, 3, ci, co)) * (1.0 / np.sqrt(9 * ci)),
            jnp.float32,
        )
        for ci, co in zip(chans[:-1], chans[1:])
    )
    biases = tuple(
        jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        for c in chans[1:]
    )
    return x, weights, biases


CASES = [
    # (n, h, w, chans, relu) — generator-shaped but small enough to interpret
    (2, 9, 12, (12, 16, 16), (True, True)),  # layer1-like: thin input
    (2, 6, 8, (16, 24), (True,)),  # single conv chain
    (1, 5, 7, (9, 13, 11), (True, False)),  # odd channels (133-style)
    (4, 4, 4, (8, 8, 8, 8), (True, True, True)),  # depth-3 chain
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_oracle(case, dtype):
    n, h, w, chans, relu = case
    rng = np.random.default_rng(hash((n, h, w, chans)) % 2**31)
    x, weights, biases = _make_chain(rng, n, h, w, chans, dtype)
    y = pc.conv_chain(x, weights, biases, relu, True)
    ref = pc.conv_chain_reference(x, weights, biases, relu)
    assert y.dtype == x.dtype and y.shape == (n, h, w, chans[-1])
    # f32: only MXU/conv summation order differs; bf16: plus one final
    # rounding of each layer output (1 ulp = 2^-8 relative).
    tol = dict(rtol=1e-5, atol=1e-5) if dtype == jnp.float32 else dict(
        rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), **tol
    )


@pytest.mark.parametrize("case", CASES[:2])
def test_grads_match_oracle_f32(case):
    """In f32 the kernel's compute dtype == the oracle's accumulation
    dtype, so all grads agree tightly."""
    n, h, w, chans, relu = case
    rng = np.random.default_rng(7)
    x, weights, biases = _make_chain(rng, n, h, w, chans, jnp.float32)

    def f_kernel(x, ws, bs):
        return pc.conv_chain(x, ws, bs, relu, True).sum()

    def f_ref(x, ws, bs):
        return pc.conv_chain_reference(x, ws, bs, relu).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(x, weights, biases)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, weights, biases)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_grads_match_oracle_bf16():
    """bf16: data grad is bit-exact; param grads differ only by the fused
    backward's bf16 cotangent rounding (<=1% of grad scale)."""
    n, h, w, chans, relu = 2, 9, 12, (12, 16, 16), (True, True)
    rng = np.random.default_rng(3)
    x, weights, biases = _make_chain(rng, n, h, w, chans, jnp.bfloat16)

    def f_kernel(x, ws, bs):
        return pc.conv_chain(x, ws, bs, relu, True).astype(jnp.float32).sum()

    def f_ref(x, ws, bs):
        return pc.conv_chain_reference(x, ws, bs, relu).astype(jnp.float32).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(x, weights, biases)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, weights, biases)
    np.testing.assert_allclose(
        np.asarray(gk[0], np.float32), np.asarray(gr[0], np.float32),
        rtol=2e-2, atol=2e-2,
    )
    for tree_k, tree_r in ((gk[1], gr[1]), (gk[2], gr[2])):
        for a, b in zip(tree_k, tree_r):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a, np.float32) / scale,
                np.asarray(b, np.float32) / scale,
                atol=1e-2,
            )


def test_pad_ring_isolation():
    """Outputs must not leak across frame boundaries: each batch frame is
    independent, exactly as in a batched XLA conv."""
    rng = np.random.default_rng(11)
    relu = (True, True)
    x, weights, biases = _make_chain(rng, 3, 6, 8, (8, 8, 8), jnp.float32)
    y_full = pc.conv_chain(x, weights, biases, relu, True)
    # Same frames, different batch neighbors -> identical per-frame output.
    y_perm = pc.conv_chain(x[::-1], weights, biases, relu, True)
    np.testing.assert_array_equal(
        np.asarray(y_full, np.float32), np.asarray(y_perm, np.float32)[::-1]
    )

def test_auto_dispatch_falls_back_off_tpu():
    """conv_chain_auto == oracle on CPU (the model integration path used
    by every CPU test of fused models)."""
    rng = np.random.default_rng(5)
    x, weights, biases = _make_chain(rng, 2, 6, 8, (8, 12), jnp.bfloat16)
    ya = pc.conv_chain_auto(x, weights, biases, (True,))
    yr = pc.conv_chain_reference(x, weights, biases, (True,))
    np.testing.assert_array_equal(np.asarray(ya, np.float32), np.asarray(yr, np.float32))


def test_fused_unet_same_tree_and_output():
    """UNetAcResNet(fused=True): identical parameter tree (TF1 ckpt
    import/export unaffected) and matching forward vs the plain model —
    on CPU the fused flag routes through the dtype-disciplined oracle,
    which differs from nn.Conv only in where the bias add rounds."""
    from acoustic_image_generation_tpu.models import UNetAcResNet
    from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap

    rng = np.random.default_rng(21)
    mfcc = jnp.asarray(rng.random((2, 12)), jnp.float32)
    feat = jnp.asarray(rng.random((2, 12, 16, 512)), jnp.float32)
    mfccmap = tile_mfccmap(mfcc)

    plain = UNetAcResNet(dtype=jnp.bfloat16)
    fused = UNetAcResNet(dtype=jnp.bfloat16, fused=True)
    variables = plain.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, mfccmap, feat
    )
    vf = fused.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, mfccmap, feat
    )
    paths_p = [p for p, _ in jax.tree_util.tree_leaves_with_path(variables)]
    paths_f = [p for p, _ in jax.tree_util.tree_leaves_with_path(vf)]
    assert paths_p == paths_f
    shapes_p = [v.shape for _, v in jax.tree_util.tree_leaves_with_path(variables)]
    shapes_f = [v.shape for _, v in jax.tree_util.tree_leaves_with_path(vf)]
    assert shapes_p == shapes_f

    out_p = plain.apply(variables, mfccmap, feat, rngs={"latent": jax.random.key(2)})
    out_f = fused.apply(variables, mfccmap, feat, rngs={"latent": jax.random.key(2)})
    np.testing.assert_allclose(
        np.asarray(out_f.output, np.float32),
        np.asarray(out_p.output, np.float32),
        rtol=5e-2, atol=5e-2,
    )

    # gradients flow through every fused layer's params
    def loss(params):
        o = fused.apply(
            {"params": params}, mfccmap, feat, rngs={"latent": jax.random.key(2)}
        )
        return jnp.mean(jnp.square(o.output.astype(jnp.float32)))

    g = jax.grad(loss)(variables["params"])
    for layer in ("layer1", "layer4", "layer5", "layer6", "layer7"):
        for conv in ("conv_1", "conv_2"):
            gk = g[layer][conv]["kernel"]
            assert float(jnp.max(jnp.abs(gk))) > 0.0, (layer, conv)


def test_jit_and_vjp_compose():
    """The custom_vjp composes with jit and value_and_grad (the Trainer's
    usage)."""
    rng = np.random.default_rng(9)
    relu = (True, True)
    x, weights, biases = _make_chain(rng, 2, 5, 6, (8, 8, 8), jnp.float32)

    @jax.jit
    def loss(x, ws, bs):
        y = pc.conv_chain(x, ws, bs, relu, True)
        return jnp.mean(jnp.square(y))

    val, grads = jax.value_and_grad(loss, argnums=(1, 2))(x, weights, biases)
    assert np.isfinite(float(val))
    for g in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(g, np.float32)))
