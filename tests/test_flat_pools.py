"""MVIT.FLAT_POOLS / FlatGroupLN: the flat [B, N, heads*C] pool layout
must be bit-compatible with the 4-d per-head AttentionPool path — same
parameter tree, same forward values, same gradients.

Reference behavior being preserved: independent per-tensor depthwise pool
convs + LayerNorm (`MViT/slowfast/models/attention.py:13-49`); the flat
layout is a pure TPU-side relayout optimization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.attention import MultiScaleAttention

jax.config.update("jax_enable_x64", False)


def _make(stride_q, stride_kv, has_cls, heads=2, dim=32, flat=False,
          sparse=False):
    return MultiScaleAttention(
        dim_out=dim,
        num_heads=heads,
        input_size=(4, 8, 8),
        qkv_bias=True,
        kernel_q=(3, 3, 3),
        kernel_kv=(3, 3, 3),
        stride_q=stride_q,
        stride_kv=stride_kv,
        has_cls_embed=has_cls,
        mode="conv",
        rel_pos_spatial=True,
        rel_pos_temporal=True,
        residual_pooling=True,
        sparse_kv=sparse,
        flat_pools=flat,
        dtype=jnp.float32,
    )


CASES = [
    # (stride_q, stride_kv, has_cls): kv-only merge, full qkv merge, no-cls
    ((1, 1, 1), (1, 2, 2), True),
    ((1, 2, 2), (1, 2, 2), True),
    ((1, 1, 1), (1, 1, 1), False),
]


@pytest.mark.parametrize("stride_q,stride_kv,has_cls", CASES)
@pytest.mark.parametrize("sparse", [False, True])
def test_flat_pools_exact(stride_q, stride_kv, has_cls, sparse):
    """MVIT.FLAT_POOLS: flat [B,N,H*C] pool layout == 4-d per-head layout
    (same params, forward, and gradients), dense and sparse-KV paths.

    When sparse=True the KV stride is overridden to (1,4,4) below, so every
    stride_kv parametrization is sparse-eligible — including the
    stride_q=(1,2,2) q-pool-with-sparse-KV flat case (ADVICE r2)."""
    thw = (4, 8, 8)
    n = int(np.prod(thw)) + (1 if has_cls else 0)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, n, 32)), jnp.float32
    )
    kv4 = (1, 4, 4) if sparse else stride_kv
    ref = _make(stride_q, kv4, has_cls, sparse=sparse)
    opt = _make(stride_q, kv4, has_cls, sparse=sparse, flat=True)
    params = ref.init(jax.random.PRNGKey(0), x, thw, deterministic=True)
    shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    shapes_o = jax.tree_util.tree_map(
        lambda a: a.shape,
        opt.init(jax.random.PRNGKey(0), x, thw, deterministic=True),
    )
    assert shapes == shapes_o

    y_ref, s_ref = ref.apply(params, x, thw, deterministic=True)
    y_opt, s_opt = opt.apply(params, x, thw, deterministic=True)
    assert s_ref == s_opt
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_opt), rtol=1e-5, atol=1e-5
    )

    def loss(mod):
        def f(p):
            y, _ = mod.apply(p, x, thw, deterministic=True)
            return jnp.sum(y * y)

        return f

    g_ref = jax.grad(loss(ref))(params)
    g_opt = jax.grad(loss(opt))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        ),
        g_ref,
        g_opt,
    )


def test_flat_pools_full_model_parity():
    """End-to-end MViT logits with FLAT_POOLS on == off (tiny config)."""
    from pmv_tpu.config.defaults import get_cfg
    from pmv_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.MVIT.POOL_Q_STRIDE = [
        [0, 1, 1, 1], [1, 1, 2, 2], [2, 1, 1, 1], [3, 1, 2, 2]
    ]
    cfg.MVIT.DIM_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.RESIDUAL_POOLING = True
    cfg.MVIT.DIM_MUL_IN_ATT = True
    cfg.MVIT.MODE = "conv"
    cfg.MVIT.CLS_EMBED_ON = True
    cfg.MVIT.SPARSE_KV_POOL = True
    cfg.TPU.COMPUTE_DTYPE = "float32"

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 3, 4, 32, 32)), jnp.float32
    )

    cfg.MVIT.FLAT_POOLS = False
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = model.apply(params, x, train=False)

    cfg.MVIT.FLAT_POOLS = True
    model_m = build_model(cfg)
    y_opt = model_m.apply(params, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_opt), rtol=1e-5, atol=1e-5
    )


def test_flat_group_ln_bf16_tolerance():
    """FlatGroupLN's bf16 fast path (0/1 stats dots on the bf16 tensor with
    f32 accumulation) stays within bf16 tolerance of nn.LayerNorm applied to
    the 4-d [B,N,H,C] layout with bf16 input — the numerics class the flat
    pools ship in the bench recipe (f32 input stays bit-exact, covered by
    test_flat_pools_exact)."""
    import flax.linen as nn

    from pmv_tpu.models.attention import FlatGroupLN

    H, C = 4, 96
    rng = np.random.default_rng(7)
    x4 = jnp.asarray(rng.normal(size=(2, 33, H, C)) * 3 + 1, jnp.bfloat16)
    xf = x4.reshape(2, 33, H * C)

    ln4 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    p4 = ln4.init(jax.random.PRNGKey(0), x4)
    # Non-trivial affine so scale/bias tiling is exercised.
    p4 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), p4
    )
    lnf = FlatGroupLN(heads=H, dtype=jnp.bfloat16)
    pf = {"params": {k: v for k, v in p4["params"].items()}}

    y4 = ln4.apply(p4, x4).reshape(2, 33, H * C).astype(np.float32)
    yf = lnf.apply(pf, xf).astype(np.float32)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(yf),
                               rtol=2e-2, atol=2e-2)

    # Gradients stay in the same tolerance class.
    g4 = jax.grad(lambda p: jnp.sum(
        ln4.apply(p, x4).astype(jnp.float32) ** 2))(p4)
    gf = jax.grad(lambda p: jnp.sum(
        lnf.apply(p, xf).astype(jnp.float32) ** 2))(pf)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(g4["params"][k]), np.asarray(gf["params"][k]),
            rtol=5e-2, atol=5e-1,
        )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_flat_group_ln_custom_vjp_matches_autodiff(dtype):
    """TPU.FLAT_LN_VJP: the hand-written FlatGroupLN backward equals
    autodiff through the stats dots (forward is the identical expression)."""
    from pmv_tpu.models.attention import FlatGroupLN

    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    H, C = 2, 48
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 19, H * C)) * 2 + 0.5, dt)

    ref = FlatGroupLN(heads=H, dtype=dt)
    opt = FlatGroupLN(heads=H, dtype=dt, custom_grad=True)
    p = ref.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), p
    )

    y_ref = ref.apply(p, x)
    y_opt = opt.apply(p, x)
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_opt, np.float32),
        rtol=1e-6, atol=1e-6,
    )

    def loss(mod, inp):
        def f(params, xx):
            return jnp.sum(mod.apply(params, xx).astype(jnp.float32) ** 2)
        return f

    tol = dict(rtol=2e-5, atol=2e-5) if dtype == "float32" else dict(
        rtol=2e-2, atol=2e-1)
    gp_ref, gx_ref = jax.grad(loss(ref, x), argnums=(0, 1))(p, x)
    gp_opt, gx_opt = jax.grad(loss(opt, x), argnums=(0, 1))(p, x)
    np.testing.assert_allclose(
        np.asarray(gx_ref, np.float32), np.asarray(gx_opt, np.float32), **tol
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), **tol
        ),
        gp_ref, gp_opt,
    )
