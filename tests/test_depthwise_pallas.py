"""Pallas depthwise conv3d vs XLA grouped conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.ops.depthwise_pallas import depthwise3x3x3


def _xla_dw(x, w):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 3, 1, c), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
    )


def test_depthwise_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 10, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.1)
    out = depthwise3x3x3(x, w)
    ref = _xla_dw(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_depthwise_tiled_h():
    from pmv_tpu.ops.depthwise_pallas import depthwise3x3x3_fwd

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 12, 6, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype(np.float32) * 0.1)
    out = depthwise3x3x3_fwd(x, w, tile_h=4)  # 3 tiles
    ref = _xla_dw(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_pools_in_model_match_xla_path():
    """Full MViT tiny: USE_PALLAS_POOLS on vs off must agree (CPU: interpret)."""
    from pmv_tpu.config import get_cfg
    from pmv_tpu.models import build_model

    def cfg_with(pallas_pools):
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
        # Block 0 q-pool: kernel 3x3x3 stride (1,1,1) -> Pallas path.
        cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2]]
        cfg.MVIT.RESIDUAL_POOLING = True
        cfg.MVIT.USE_PALLAS_POOLS = pallas_pools
        return cfg

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16, 3))
    m_xla = build_model(cfg_with(False), dtype=jnp.float32)
    variables = m_xla.init(jax.random.PRNGKey(0), x, train=False)
    out_xla = m_xla.apply(variables, x, train=False)

    m_pl = build_model(cfg_with(True), dtype=jnp.float32)
    import pmv_tpu.ops.depthwise_pallas as dp

    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        dp.INTERPRET_OVERRIDE = True
        out_pl = m_pl.apply(variables, x, train=False)
    finally:
        jax.default_backend = orig
        dp.INTERPRET_OVERRIDE = None
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), atol=2e-4, rtol=1e-4
    )


def test_depthwise_gradients_match_xla():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 6, 6, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype(np.float32) * 0.1)

    def loss_pl(x, w):
        return jnp.sum(depthwise3x3x3(x, w) ** 2)

    def loss_xla(x, w):
        return jnp.sum(_xla_dw(x, w) ** 2)

    gx_pl, gw_pl = jax.grad(loss_pl, (0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss_xla, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_ref), atol=1e-3)


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
import pytest  # noqa: E402  (slow-mark only)
pytestmark = pytest.mark.slow
