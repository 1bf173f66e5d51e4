"""Sparse (decimated) K/V projection+pool vs the dense grouped-conv path.

MVIT.SPARSE_KV_POOL restructures K/V computation for disjoint pool windows
(stride >= kernel — the POOL_KV_STRIDE_ADAPTIVE stage-1/2 geometries of
`MViT/configs/Kinetics/MVITv2_S_16x4.yaml`): token rows are decimated
*before* the projection, so the conv only ever sees the rows it reads.
The math must be exactly the dense path's (same params, same outputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.attention import (
    MultiScaleAttention,
    decimate_pool_windows,
)


def _mk_attn(sparse, stride_kv, **over):
    kw = dict(
        dim_out=32,
        num_heads=2,
        input_size=(4, 16, 16),
        qkv_bias=True,
        kernel_q=(),
        kernel_kv=(3, 3, 3),
        stride_q=(),
        stride_kv=stride_kv,
        has_cls_embed=True,
        mode="conv",
        rel_pos_spatial=True,
        rel_pos_temporal=True,
        residual_pooling=True,
        sparse_kv=sparse,
    )
    kw.update(over)
    return MultiScaleAttention(**kw)


@pytest.mark.parametrize("stride_kv", [(1, 4, 4), (1, 8, 8), (1, 3, 3)])
@pytest.mark.parametrize("has_cls", [True, False])
def test_sparse_matches_dense(stride_kv, has_cls):
    T, H, W, C = 4, 16, 16, 32
    N = T * H * W + (1 if has_cls else 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, N, C), jnp.float32)
    m1 = _mk_attn(True, stride_kv, has_cls_embed=has_cls)
    m0 = _mk_attn(False, stride_kv, has_cls_embed=has_cls)
    v1 = m1.init(jax.random.PRNGKey(1), x, (T, H, W))
    v0 = m0.init(jax.random.PRNGKey(1), x, (T, H, W))
    # Identical parameter trees: checkpoints are interchangeable.
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    y1, s1 = m1.apply(v0, x, (T, H, W))
    y0, s0 = m0.apply(v0, x, (T, H, W))
    assert s1 == s0
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=2e-5, rtol=1e-4
    )

    def loss(params, m):
        y, _ = m.apply({"params": params}, x, (T, H, W))
        return jnp.sum(y * y)

    g1 = jax.grad(loss)(v0["params"], m1)
    g0 = jax.grad(loss)(v0["params"], m0)
    for p1, p0 in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)
    ):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p0), atol=5e-4, rtol=1e-3
        )


def test_decimation_geometry():
    """Every window row lands where the SAME conv would read it."""
    T, H, W, C = 2, 11, 13, 3
    kernel, stride = (3, 3, 3), (1, 4, 4)
    x = jnp.arange(T * H * W * C, dtype=jnp.float32).reshape(1, -1, C)
    g, (Tp, Ph, Pw) = decimate_pool_windows(x, (T, H, W), kernel, stride)
    assert (Tp, Ph, Pw) == (T + 2, (H - 1) // 4 + 1, (W - 1) // 4 + 1)
    full = np.asarray(x).reshape(T, H, W, C)
    gnp = np.asarray(g)[0]
    for tp in range(Tp):
        for p in range(Ph):
            for i in range(3):
                for q in range(Pw):
                    for j in range(3):
                        t, h, w = tp - 1, 4 * p + i - 1, 4 * q + j - 1
                        got = gnp[tp, p, i, q, j]
                        if 0 <= t < T and 0 <= h < H and 0 <= w < W:
                            np.testing.assert_array_equal(got, full[t, h, w])
                        else:
                            # zero padding (mask applied post-projection in
                            # AttentionPool; raw gather must still be zero)
                            np.testing.assert_array_equal(got, 0.0)


def test_tiny_mvit_model_sparse_parity():
    """Full tiny MViT: SPARSE_KV_POOL on/off must agree, params identical."""
    from __graft_entry__ import _mvitv2_s_cfg
    from pmv_tpu.models import build_model

    cfg = _mvitv2_s_cfg(tiny=True)
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    x = jax.random.normal(
        jax.random.PRNGKey(0), (2, cfg.DATA.NUM_FRAMES, 32, 32, 3),
        jnp.float32,
    )
    outs = {}
    v0 = None
    for sparse in (True, False):
        cfg.MVIT.SPARSE_KV_POOL = sparse
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        if v0 is None:
            v0 = variables
        else:
            assert jax.tree_util.tree_structure(
                v0
            ) == jax.tree_util.tree_structure(variables)
        outs[sparse] = model.apply(v0, x, train=False)
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), atol=2e-5, rtol=1e-4
    )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
