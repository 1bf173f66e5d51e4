"""Checkpoint save / load / auto-resume roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.config import get_cfg
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
from pmv_tpu.utils import checkpoint as cu


def _cfg(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MVIT.DEPTH = 1
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1]]
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    return cfg


def _state(cfg):
    model = build_model(cfg, dtype=jnp.float32)
    batch = {
        "frames": np.zeros((2, 2, 16, 16, 3), np.uint8),
        "labels": np.zeros((2,), np.int64),
    }
    state, _ = steps.init_state(cfg, model, batch, jax.random.PRNGKey(0))
    return state


def test_save_load_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    state = _state(cfg)
    path = cu.save_checkpoint(cfg.OUTPUT_DIR, state, epoch=4, cfg=cfg)
    assert "checkpoint_epoch_00005" in path
    restored, epoch = cu.load_checkpoint(path, state)
    assert epoch == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_get_last_checkpoint_ordering(tmp_path):
    cfg = _cfg(tmp_path)
    state = _state(cfg)
    cu.save_checkpoint(cfg.OUTPUT_DIR, state, epoch=1, cfg=cfg)
    cu.save_checkpoint(cfg.OUTPUT_DIR, state, epoch=11, cfg=cfg)
    cu.save_checkpoint(cfg.OUTPUT_DIR, state, epoch=5, cfg=cfg)
    last = cu.get_last_checkpoint(cfg.OUTPUT_DIR)
    assert last.endswith("checkpoint_epoch_00012")


def test_auto_resume(tmp_path):
    cfg = _cfg(tmp_path)
    state = _state(cfg)
    # Mutate params so the saved state is distinguishable from fresh init.
    mutated = state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params)
    )
    cu.save_checkpoint(cfg.OUTPUT_DIR, mutated, epoch=2, cfg=cfg)
    fresh = _state(cfg)
    resumed, start_epoch = cu.load_train_checkpoint(cfg, fresh)
    assert start_epoch == 3
    a = jax.tree_util.tree_leaves(resumed.params)[0]
    b = jax.tree_util.tree_leaves(mutated.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_test_checkpoint_priority(tmp_path):
    cfg = _cfg(tmp_path)
    state = _state(cfg)
    mutated = state.replace(
        params=jax.tree_util.tree_map(lambda p: p * 2.0 + 3.0, state.params)
    )
    cu.save_checkpoint(cfg.OUTPUT_DIR, mutated, epoch=0, cfg=cfg)
    # No TEST.CHECKPOINT_FILE_PATH: falls back to last checkpoint.
    restored = cu.load_test_checkpoint(cfg, state)
    a = jax.tree_util.tree_leaves(restored.params)[0]
    b = jax.tree_util.tree_leaves(mutated.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
import pytest  # noqa: E402  (slow-mark only)
pytestmark = pytest.mark.slow
