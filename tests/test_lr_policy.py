import math

import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.utils import lr_policy


def _mvit_cfg():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.COSINE_END_LR = 1e-6
    cfg.SOLVER.WARMUP_START_LR = 1e-6
    cfg.SOLVER.WARMUP_EPOCHS = 30.0
    cfg.SOLVER.MAX_EPOCH = 200
    cfg.SOLVER.COSINE_AFTER_WARMUP = True
    return cfg


def test_warmup_linear():
    cfg = _mvit_cfg()
    lr0 = lr_policy.get_lr_at_epoch(cfg, 0.0)
    assert lr0 == pytest.approx(1e-6)
    # Warmup target equals the cosine value at warmup end.
    lr_end = lr_policy.get_lr_at_epoch(cfg, 30.0)
    assert lr_end == pytest.approx(1e-4, rel=1e-6)
    # Mid-warmup is the linear blend.
    lr_mid = lr_policy.get_lr_at_epoch(cfg, 15.0)
    assert lr_mid == pytest.approx((1e-6 + 1e-4) / 2, rel=1e-3)


def test_cosine_after_warmup_offset():
    cfg = _mvit_cfg()
    # At max epoch the cosine reaches END_LR.
    lr_final = lr_policy.get_lr_at_epoch(cfg, 200.0)
    assert lr_final == pytest.approx(1e-6, rel=1e-6)
    # Exact midpoint of the post-warmup cosine.
    mid_epoch = 30.0 + (200.0 - 30.0) / 2
    expected = 1e-6 + (1e-4 - 1e-6) * 0.5 * (math.cos(math.pi / 2) + 1)
    assert lr_policy.get_lr_at_epoch(cfg, mid_epoch) == pytest.approx(expected)


def test_steps_policy():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.STEPS = [0, 10, 20]
    cfg.SOLVER.LRS = [1.0, 0.1, 0.01]
    cfg.SOLVER.MAX_EPOCH = 30
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    assert lr_policy.get_lr_at_epoch(cfg, 5) == pytest.approx(0.1)
    assert lr_policy.get_lr_at_epoch(cfg, 15) == pytest.approx(0.01)
    assert lr_policy.get_lr_at_epoch(cfg, 25) == pytest.approx(0.001)


def test_per_iteration_granularity():
    """LR changes at fractional epochs (epoch_exact = epoch + iter/len)."""
    cfg = _mvit_cfg()
    lrs = [lr_policy.get_lr_at_epoch(cfg, 10.0 + i / 100) for i in range(3)]
    assert lrs[0] < lrs[1] < lrs[2]  # monotonically rising during warmup
