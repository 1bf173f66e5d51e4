"""Fused block kernels (ops/mlp_block_pallas, ops/attn_block_pallas) vs the
unfused module paths — interpret mode off-TPU, exact same params and rng.

These kernels exist to cut HBM traffic on the bandwidth-bound train step
(ROADMAP roofline account): the MLP hidden, LN output, attention probs and
pre-projection context stay in VMEM across fwd + recompute-bwd.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.ops import attn_block_pallas, mlp_block_pallas


@pytest.fixture(autouse=True)
def _interpret():
    mlp_block_pallas.INTERPRET_OVERRIDE = True
    attn_block_pallas.INTERPRET_OVERRIDE = True
    yield
    mlp_block_pallas.INTERPRET_OVERRIDE = None
    attn_block_pallas.INTERPRET_OVERRIDE = None


def test_fused_mlp_residual_math():
    B, N, C, H = 2, 100, 32, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, N, C), jnp.float32)
    args = (
        x,
        jax.random.normal(ks[1], (C,)) * 0.1 + 1.0,
        jax.random.normal(ks[2], (C,)) * 0.1,
        jax.random.normal(ks[3], (C, H)) * 0.05,
        jax.random.normal(ks[4], (H,)) * 0.05,
        jax.random.normal(ks[5], (H, C)) * 0.05,
        jax.random.normal(ks[6], (C,)) * 0.05,
        jnp.asarray([1.0, 0.8]),
    )

    def ref(x, ln_s, ln_b, w1, b1, w2, b2, dp):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
        ln = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
        h = jax.nn.gelu(ln @ w1 + b1)
        return x + dp[:, None, None] * (h @ w2 + b2)

    y = mlp_block_pallas.fused_mlp_residual(*args)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref(*args)), atol=2e-5, rtol=1e-4
    )
    # grads (dp excluded: the kernel declares its cotangent unused)
    g = jax.grad(
        lambda *a: jnp.sum(mlp_block_pallas.fused_mlp_residual(*a) ** 2),
        argnums=tuple(range(7)),
    )(*args)
    gr = jax.grad(
        lambda *a: jnp.sum(ref(*a) ** 2), argnums=tuple(range(7))
    )(*args)
    for p, q in zip(g, gr):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=5e-4, rtol=1e-3
        )


def _block_pair(fused_attn=False, fused_mlp=False, **over):
    from pmv_tpu.models.attention import MultiScaleBlock

    kw = dict(
        dim=32, dim_out=64, num_heads=2, input_size=(2, 8, 8),
        qkv_bias=True, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 4, 4), has_cls_embed=True,
        mode="conv", rel_pos_spatial=True, rel_pos_temporal=True,
        residual_pooling=True, dim_mul_in_att=True, drop_path=0.2,
    )
    kw.update(over)
    m1 = MultiScaleBlock(fused_attn=fused_attn, fused_mlp=fused_mlp, **kw)
    m0 = MultiScaleBlock(**kw)
    return m0, m1


@pytest.mark.parametrize(
    "fused_attn,fused_mlp", [(True, False), (False, True), (True, True)]
)
def test_fused_block_matches_unfused(fused_attn, fused_mlp):
    T, H, W, C = 2, 8, 8, 32
    N = T * H * W + 1
    x = jax.random.normal(jax.random.PRNGKey(0), (2, N, C), jnp.float32)
    m0, m1 = _block_pair(fused_attn=fused_attn, fused_mlp=fused_mlp)
    v0 = m0.init({"params": jax.random.PRNGKey(1)}, x, (T, H, W))
    v1 = m1.init({"params": jax.random.PRNGKey(1)}, x, (T, H, W))
    # identical parameter trees => checkpoints interchangeable
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    y0, s0 = m0.apply(v0, x, (T, H, W), True)
    y1, s1 = m1.apply(v0, x, (T, H, W), True)
    assert s0 == s1
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=2e-5, rtol=1e-4
    )

    def loss(p, m):
        y, _ = m.apply({"params": p}, x, (T, H, W), True)
        return jnp.sum(y * y)

    g0 = jax.grad(loss)(v0["params"], m0)
    g1 = jax.grad(loss)(v0["params"], m1)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )


def test_fused_block_train_mode_droppath_stream():
    """Same dropout rng => identical drop-path decisions fused vs not."""
    T, H, W, C = 2, 8, 8, 32
    N = T * H * W + 1
    x = jax.random.normal(jax.random.PRNGKey(0), (4, N, C), jnp.float32)
    m0, m1 = _block_pair(fused_attn=True, fused_mlp=True, drop_path=0.5)
    v0 = m0.init({"params": jax.random.PRNGKey(1)}, x, (T, H, W))
    rngs = {"dropout": jax.random.PRNGKey(7)}
    y0, _ = m0.apply(v0, x, (T, H, W), False, rngs=rngs)
    y1, _ = m1.apply(v0, x, (T, H, W), False, rngs=rngs)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("cls_name", ["SABlock", "SplitSABlock"])
def test_uniformer_fused_mlp_matches(cls_name):
    from pmv_tpu.models import uniformer

    cls = getattr(uniformer, cls_name)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (2, 2, 4, 4, 32), jnp.float32
    )
    kw = dict(dim=32, num_heads=4, drop_path=0.3)
    m1 = cls(fused_mlp=True, **kw)
    m0 = cls(fused_mlp=False, **kw)
    v1 = m1.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    v0 = m0.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    y1 = m1.apply(v0, x, train=False)
    y0 = m0.apply(v0, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=2e-5, rtol=1e-4
    )


def test_per_head_attn_impl_matches_batched():
    from pmv_tpu.models.attention import MultiScaleAttention

    T, H, W, C = 2, 8, 8, 32
    N = T * H * W + 1
    x = jax.random.normal(jax.random.PRNGKey(0), (2, N, C), jnp.float32)
    kw = dict(
        dim_out=C, num_heads=2, input_size=(T, H, W), qkv_bias=True,
        kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(), stride_kv=(1, 4, 4),
        has_cls_embed=True, mode="conv", rel_pos_spatial=True,
        rel_pos_temporal=True, residual_pooling=True,
    )
    m0 = MultiScaleAttention(attn_impl="batched", **kw)
    m1 = MultiScaleAttention(attn_impl="per_head", **kw)
    v0 = m0.init(jax.random.PRNGKey(1), x, (T, H, W))
    y0, _ = m0.apply(v0, x, (T, H, W))
    y1, _ = m1.apply(v0, x, (T, H, W))
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=2e-5, rtol=1e-4
    )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
