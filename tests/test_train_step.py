"""End-to-end jitted train step on an 8-device CPU mesh (DP sharding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
from pmv_tpu.parallel import mesh as mesh_lib


def _tiny_train_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.LOSS_FUNC = "soft_cross_entropy"
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MVIT.DEPTH = 1
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = False
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1]]
    cfg.MVIT.RESIDUAL_POOLING = True
    cfg.MVIT.DIM_MUL_IN_ATT = True
    cfg.MIXUP.ENABLE = True
    cfg.MIXUP.ALPHA = 0.8
    cfg.AUG.ENABLE = False  # RandAugment compile is heavy on CPU tests
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.CLIP_GRAD_L2NORM = 1.0
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    return cfg


def _make_batch(cfg, batch=8):
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 255,
        (batch, cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE,
         cfg.DATA.TRAIN_CROP_SIZE, 3),
        dtype=np.uint8,
    )
    labels = rng.integers(0, cfg.MODEL.NUM_CLASSES, (batch,), dtype=np.int64)
    return {"frames": jnp.asarray(frames), "labels": jnp.asarray(labels)}


def test_train_step_runs_and_learns():
    cfg = _tiny_train_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    batch = _make_batch(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = steps.init_state(cfg, model, batch, rng)
    train_step = jax.jit(steps.make_train_step(cfg, model, tx))
    losses = []
    for _ in range(3):
        state, metrics = train_step(state, batch, rng, 1e-3)
        losses.append(float(metrics["loss"]))
        assert not bool(metrics["nan"])
    assert int(state.step) == 3
    # Same batch re-fed: loss should drop.
    assert losses[-1] < losses[0]


def test_train_step_sharded_8dev(cpu_devices):
    """DP train step over an 8-device mesh: batch sharded, params replicated."""
    cfg = _tiny_train_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    batch = _make_batch(cfg, batch=8)
    rng = jax.random.PRNGKey(0)

    mesh = mesh_lib.create_mesh(devices=cpu_devices)
    state, tx = steps.init_state(cfg, model, batch, rng)
    state = mesh_lib.replicate(state, mesh)
    sharded_batch = mesh_lib.shard_batch(batch, mesh)

    train_step = jax.jit(steps.make_train_step(cfg, model, tx))
    new_state, metrics = train_step(state, sharded_batch, rng, 1e-3)
    assert not bool(metrics["nan"])
    assert float(metrics["loss"]) > 0
    # Gradient reduction is global: params stay replicated.
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_eval_step():
    cfg = _tiny_train_cfg()
    cfg.TEST.PROCESS = True
    model = build_model(cfg, dtype=jnp.float32)
    batch = _make_batch(cfg, batch=4)
    rng = jax.random.PRNGKey(0)
    state, _ = steps.init_state(cfg, model, batch, rng)
    eval_step = jax.jit(steps.make_eval_step(cfg, model))
    preds = eval_step(state, batch["frames"])
    assert preds.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(preds).sum(axis=1), 1.0, rtol=1e-4)


def test_lr_injection():
    """set_lr must change the actual update magnitude."""
    cfg = _tiny_train_cfg()
    cfg.MIXUP.ENABLE = False
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    model = build_model(cfg, dtype=jnp.float32)
    batch = _make_batch(cfg, batch=2)
    rng = jax.random.PRNGKey(0)
    state, tx = steps.init_state(cfg, model, batch, rng)
    train_step = jax.jit(steps.make_train_step(cfg, model, tx))
    s_hi, _ = train_step(state, batch, rng, 1e-2)
    s_lo, _ = train_step(state, batch, rng, 1e-6)
    d_hi = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_hi.params, state.params
    )
    d_lo = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_lo.params, state.params
    )
    hi = max(jax.tree_util.tree_leaves(d_hi))
    lo = max(jax.tree_util.tree_leaves(d_lo))
    assert hi > lo * 100


def test_frozen_bn_keeps_stats():
    """MODEL.FROZEN_BN: running BN statistics unchanged by train steps."""
    import numpy as np

    from pmv_tpu.config import get_cfg
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MODEL.FROZEN_BN = True
    model = build_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    batch = {
        "frames": jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (2, 2, 16, 16, 3), np.uint8
            )
        ),
        "labels": jnp.asarray([0, 1]),
    }
    state, tx = steps.init_state(cfg, model, batch, rng)
    step = jax.jit(steps.make_train_step(cfg, model, tx))
    new_state, _ = step(state, batch, rng, 1e-3)
    for a, b in zip(
        jax.tree.leaves(state.batch_stats),
        jax.tree.leaves(new_state.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multigrid_aware_eval_epochs():
    """Multigrid schedules force EVAL_FREQ evals per long cycle aligned to
    the cycle end (`misc.py:228-250`)."""
    from pmv_tpu.config import get_cfg
    from pmv_tpu.utils import misc

    cfg = get_cfg()
    cfg.SOLVER.MAX_EPOCH = 30
    cfg.TRAIN.EVAL_PERIOD = 10
    schedule = [(0, [4, 8, 158], 12), (1, [1, 16, 224], 30)]
    # Cycle ends (epoch 11 and 29) are always eval epochs.
    assert misc.is_eval_epoch(cfg, 11, schedule)
    assert misc.is_eval_epoch(cfg, 29, schedule)
    # Plain schedule without multigrid falls back to EVAL_PERIOD.
    assert misc.is_eval_epoch(cfg, 9, None)
    assert not misc.is_eval_epoch(cfg, 8, None)


def test_multilabel_bce_train_step():
    """Charades-style multi-label training: float label vectors + BCE."""
    import numpy as np

    from pmv_tpu.config import get_cfg
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 6
    cfg.MODEL.LOSS_FUNC = "bce_logit"
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    model = build_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    labels = np.zeros((2, 6), np.float32)
    labels[0, [1, 3]] = 1.0
    labels[1, [0]] = 1.0
    batch = {
        "frames": jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (2, 2, 16, 16, 3), np.uint8
            )
        ),
        "labels": jnp.asarray(labels),
    }
    state, tx = steps.init_state(cfg, model, batch, rng)
    step = jax.jit(steps.make_train_step(cfg, model, tx))
    new_state, metrics = step(state, batch, rng, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
