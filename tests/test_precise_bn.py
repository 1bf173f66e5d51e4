"""Precise-BN recovers the true mean of per-batch statistics."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.config import get_cfg
from pmv_tpu.data.loader import DataLoader
from pmv_tpu.engine import steps
from pmv_tpu.engine.precise_bn import calculate_and_update_precise_bn
from pmv_tpu.models import build_model
from pmv_tpu.parallel import mesh as mesh_lib


class _FixedDataset:
    """Deterministic frames so true batch stats are computable."""

    def __init__(self, n, shape):
        self.n = n
        self.shape = shape

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "frames": rng.integers(0, 255, self.shape, dtype=np.uint8),
            "label": int(i % 3),
            "index": i,
            "time": 0.0,
            "pm": False,
        }


def test_precise_bn_updates_stats():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.BN.NUM_BATCHES_PRECISE = 3

    model = build_model(cfg, dtype=jnp.float32)
    ds = _FixedDataset(24, (2, 16, 16, 3))
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    state, _ = steps.init_state(
        cfg, model, {"frames": batch["frames"], "labels": batch["labels"]}, rng
    )
    mesh = mesh_lib.create_mesh()
    old_stats = jax.device_get(state.batch_stats)
    new_state = calculate_and_update_precise_bn(loader, state, cfg, model, mesh)
    new_stats = jax.device_get(new_state.batch_stats)
    # Stats moved away from init (mean 0 / var 1) toward data statistics.
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        old_stats, new_stats,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.01
    # Variances stay positive.
    flat = jax.tree_util.tree_flatten_with_path(new_stats)[0]
    for path, leaf in flat:
        if any("var" in str(getattr(k, "key", k)) for k in path):
            assert float(np.asarray(leaf).min()) > 0
