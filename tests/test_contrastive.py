"""Contrastive SSL: losses + end-to-end train steps for each method."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.engine import ssl_steps
from pmv_tpu.models import build_model
from pmv_tpu.models import contrastive as cm


def _ssl_cfg(ssl_type):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 0
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.CONTRASTIVE.TYPE = ssl_type
    cfg.CONTRASTIVE.DIM = 8
    cfg.CONTRASTIVE.MLP_DIM = 16
    cfg.CONTRASTIVE.NUM_MLP_LAYERS = 2
    cfg.CONTRASTIVE.QUEUE_LEN = 32
    cfg.CONTRASTIVE.LENGTH = 64
    cfg.CONTRASTIVE.SWAV_QEUE_LEN = 16
    cfg.CONTRASTIVE.KNN_ON = False
    cfg.AUG.ENABLE = False
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.NESTEROV = True
    return cfg


def _batch(cfg, b=4):
    rng = np.random.default_rng(0)
    return {
        "frames": jnp.asarray(
            rng.integers(0, 255, (b, 2, 16, 16, 3), dtype=np.uint8)
        ),
        "index": jnp.asarray(rng.integers(0, 64, (b,), dtype=np.int64)),
    }


def test_simclr_loss_prefers_aligned_views():
    z = jax.nn.standardize(jax.random.normal(jax.random.PRNGKey(0), (4, 8)))
    z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
    aligned = cm.simclr_loss(z, z, 0.1)
    shuffled = cm.simclr_loss(z, z[::-1], 0.1)
    assert float(aligned) < float(shuffled)


def test_moco_queue_update():
    queue = jnp.zeros((8, 4))
    keys = jnp.ones((3, 4))
    q1, ptr = cm.queue_update(queue, jnp.int32(6), keys)
    # Wraps: rows 6, 7, 0 written.
    assert float(q1[6].sum()) == 4 and float(q1[7].sum()) == 4
    assert float(q1[0].sum()) == 4 and float(q1[1].sum()) == 0
    assert int(ptr) == 1


def test_sinkhorn_doubly_stochastic():
    scores = jax.random.normal(jax.random.PRNGKey(0), (6, 4))
    q = cm.sinkhorn(scores, n_iters=10)
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, atol=1e-3)


@pytest.mark.parametrize("ssl_type", ["moco", "simclr", "byol", "swav", "mem"])
def test_ssl_train_step(ssl_type):
    cfg = _ssl_cfg(ssl_type)
    model = build_model(cfg, dtype=jnp.float32)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = ssl_steps.init_ssl_state(cfg, model, batch, rng)
    step = jax.jit(ssl_steps.make_ssl_train_step(cfg, model, tx))
    for _ in range(2):
        state, metrics = step(state, batch, rng, 1e-3)
        assert not bool(metrics["nan"]), ssl_type
    assert int(state.step) == 2
    if ssl_type == "moco":
        # Queue advanced by 2 batches of 4.
        assert int(state.queue_ptr) == 8
        # Momentum params differ from online after updates.
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params, state.momentum_params,
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_ssl_multiclip_views_step():
    """[B, V, T, H, W, C] multi-clip batches: views pair up per clip
    (`kinetics.py:258-276` TRAIN_CROP_NUM_TEMPORAL)."""
    cfg = _ssl_cfg("simclr")
    model = build_model(cfg, dtype=jnp.float32)
    rng_np = np.random.default_rng(1)
    batch = {
        "frames": jnp.asarray(
            rng_np.integers(0, 255, (4, 2, 2, 16, 16, 3), dtype=np.uint8)
        ),
        "index": jnp.asarray(rng_np.integers(0, 64, (4,), dtype=np.int64)),
    }
    rng = jax.random.PRNGKey(0)
    state, tx = ssl_steps.init_ssl_state(
        cfg, model, {"frames": batch["frames"][:, 0], "index": batch["index"]},
        rng,
    )
    step = jax.jit(ssl_steps.make_ssl_train_step(cfg, model, tx))
    state, metrics = step(state, batch, rng, 1e-3)
    assert not bool(metrics["nan"])


def test_knn_feature_step_and_predict():
    from pmv_tpu.models import contrastive as cm

    cfg = _ssl_cfg("mem")
    cfg.CONTRASTIVE.KNN_ON = True
    model = build_model(cfg, dtype=jnp.float32)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = ssl_steps.init_ssl_state(cfg, model, batch, rng)
    feature_step = jax.jit(ssl_steps.make_ssl_feature_step(cfg, model))
    feats = feature_step(state, batch["frames"])
    assert feats.shape == (4, cfg.CONTRASTIVE.DIM)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5
    )
    labels = jnp.asarray(np.arange(64) % 5)
    scores = cm.knn_predict(state.bank + 1e-3, labels, feats, 5, k=8)
    assert scores.shape == (4, 5)


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
