"""pool_conv custom gradients vs XLA autodiff (CPU; Pallas dw in interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.ops import pool_conv as pcm


def _xla_conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=w.shape[-1],
    )


CASES = [
    ((3, 3, 3), (1, 1, 1)),
    ((3, 3, 3), (1, 2, 2)),
    ((3, 3, 3), (1, 4, 4)),
    ((1, 3, 3), (1, 1, 1)),
    ((1, 3, 3), (1, 2, 2)),
]


@pytest.mark.parametrize("kernel,stride", CASES)
def test_pool_conv_grads_match_autodiff(kernel, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=kernel + (1, 16)).astype(np.float32) * 0.1
    )
    padding = tuple((k // 2, k // 2) for k in kernel)

    def loss_custom(x, w):
        return jnp.sum(pcm.pool_conv(x, w, stride, padding) ** 2)

    def loss_xla(x, w):
        return jnp.sum(_xla_conv(x, w, stride, padding) ** 2)

    np.testing.assert_allclose(
        np.asarray(loss_custom(x, w)), np.asarray(loss_xla(x, w)), rtol=1e-5
    )
    gx, gw = jax.grad(loss_custom, (0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_xla, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-3)


def test_dw_grad_pallas_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 6, 10, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 3, 6, 10, 8)).astype(np.float32))
    padding = ((1, 1), (1, 1), (1, 1))
    try:
        pcm.INTERPRET_OVERRIDE = True
        dw = pcm._dw_grad_pallas(x, g)
    finally:
        pcm.INTERPRET_OVERRIDE = None
    ref = pcm._dw_grad_xla(x, g, (3, 3, 3), (1, 1, 1), padding)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref), atol=1e-3)


def test_pool_conv_in_model_grads():
    """MViT tiny fwd+bwd with pool_conv patched in matches native grads."""
    from pmv_tpu.config import get_cfg
    from pmv_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2]]
    model = build_model(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(v):
        return jnp.sum(model.apply(v, x, train=False) ** 2)

    g_ref = jax.grad(loss)(variables)  # native XLA conv autodiff

    # Same loss with the custom-gradient op patched into the pool path.
    import pmv_tpu.models.attention as A

    orig = A._pool_conv
    try:
        A._pool_conv = pcm.pool_conv
        g = jax.grad(loss)(variables)
    finally:
        A._pool_conv = orig
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.parametrize("kernel,stride", CASES)
def test_dw_shifted_matches_xla(kernel, stride):
    """Shifted-MAC depthwise forward == XLA grouped conv (all pool shapes)."""
    rng = np.random.default_rng(3)
    c = 6
    x = jnp.asarray(rng.normal(size=(2, 4, 9, 10, c)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=kernel + (1, c)).astype(np.float32) * 0.1
    )
    padding = [(k // 2, k // 2) for k in kernel]
    ref = _xla_conv(x, w, stride, padding)
    out = pcm.dw_shifted(x, w, stride, padding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # Gradients are plain autodiff of pad/slice/mul/add; check vs conv grads.
    g_ref = jax.grad(lambda a, b: jnp.sum(_xla_conv(a, b, stride, padding) ** 2),
                     argnums=(0, 1))(x, w)
    g = jax.grad(
        lambda a, b: jnp.sum(pcm.dw_shifted(a, b, stride, padding) ** 2),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(g[1]).ravel(), np.asarray(g_ref[1]).ravel(), atol=1e-3
    )


def test_attention_pool_head_fold_matches_per_head_reference():
    """Head-folded depthwise pool == per-head shared-weight conv + LN
    (reference folds heads into the *batch*, `attention.py:13-49`).
    Regression: a c-major fold permuted head/channel pairs for H > 1."""
    from pmv_tpu.models.attention import AttentionPool

    B, H, C = 1, 3, 5
    T, Hh, Ww = 8, 4, 4
    N = T * Hh * Ww
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, N, H, C)).astype(np.float32)
    )
    pool = AttentionPool(
        kernel=(3, 3, 3), stride=(1, 1, 1), mode="conv",
        has_cls_embed=False, dtype=jnp.float32,
    )
    params = pool.init(jax.random.PRNGKey(0), x, (T, Hh, Ww))
    out, _ = pool.apply(params, x, (T, Hh, Ww))
    w = params["params"]["pool_kernel"]
    ln_s = params["params"]["norm"]["scale"]
    ln_b = params["params"]["norm"]["bias"]
    ref = []
    for h in range(H):
        xh = x[:, :, h].reshape(B, T, Hh, Ww, C)
        o = _xla_conv(xh, w.reshape(3, 3, 3, 1, C), (1, 1, 1), [(1, 1)] * 3)
        ref.append(o.reshape(B, -1, C))
    ref = jnp.stack(ref, axis=2)  # [B, N', H, C] module layout
    mean = ref.mean(-1, keepdims=True)
    var = ref.var(-1, keepdims=True)
    ref_ln = (ref - mean) / jnp.sqrt(var + 1e-6) * ln_s + ln_b
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_ln), atol=1e-5
    )


@pytest.mark.parametrize("stride", [(1, 4, 4), (1, 8, 8), (1, 3, 3)])
def test_dw_window_matches_xla(stride):
    """Disjoint-window depthwise lowering == XLA grouped conv + grads."""
    rng = np.random.default_rng(5)
    c = 6
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, c)).astype(np.float32) * 0.1)
    padding = [(1, 1), (1, 1), (1, 1)]
    ref = _xla_conv(x, w, stride, padding)
    out = pcm.dw_window(x, w, stride, padding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    g_ref = jax.grad(
        lambda a, b: jnp.sum(_xla_conv(a, b, stride, padding) ** 2),
        argnums=(0, 1),
    )(x, w)
    g = jax.grad(
        lambda a, b: jnp.sum(pcm.dw_window(a, b, stride, padding) ** 2),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(g[1]).ravel(), np.asarray(g_ref[1]).ravel(), atol=1e-3
    )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
