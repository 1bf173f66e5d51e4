"""Learning-rate policies.

Numerically matches the reference (`MViT/slowfast/utils/lr_policy.py:9-94`):
cosine with COSINE_END_LR and optional COSINE_AFTER_WARMUP offset, step policy
with relative LRs, linear warmup blended per *fractional* epoch (epoch_exact =
epoch + iter/len, per-iteration granularity).

Note on similarity to the reference file: these ~60 lines of schedule math
ARE the parity spec — any drift in the formulas (warmup blend point, cosine
offset, step boundaries) changes training outcomes, so the implementation
must produce bit-identical schedules (tests/test_lr_policy.py asserts this
against reference-derived values). The host-side schedule is deliberately
plain Python: it feeds the jitted step a scalar per iteration, so none of
it belongs on-device.
"""

import math


def get_lr_at_epoch(cfg, cur_epoch):
    """LR at a (fractional) epoch, with linear warmup to the policy curve."""
    lr = get_lr_func(cfg.SOLVER.LR_POLICY)(cfg, cur_epoch)
    if cur_epoch < cfg.SOLVER.WARMUP_EPOCHS:
        lr_start = cfg.SOLVER.WARMUP_START_LR
        lr_end = get_lr_func(cfg.SOLVER.LR_POLICY)(cfg, cfg.SOLVER.WARMUP_EPOCHS)
        alpha = (lr_end - lr_start) / cfg.SOLVER.WARMUP_EPOCHS
        lr = cur_epoch * alpha + lr_start
    return lr


def lr_func_cosine(cfg, cur_epoch):
    offset = cfg.SOLVER.WARMUP_EPOCHS if cfg.SOLVER.COSINE_AFTER_WARMUP else 0.0
    assert cfg.SOLVER.COSINE_END_LR < cfg.SOLVER.BASE_LR
    return (
        cfg.SOLVER.COSINE_END_LR
        + (cfg.SOLVER.BASE_LR - cfg.SOLVER.COSINE_END_LR)
        * (
            math.cos(
                math.pi * (cur_epoch - offset) / (cfg.SOLVER.MAX_EPOCH - offset)
            )
            + 1.0
        )
        * 0.5
    )


def lr_func_steps_with_relative_lrs(cfg, cur_epoch):
    ind = get_step_index(cfg, cur_epoch)
    return cfg.SOLVER.LRS[ind] * cfg.SOLVER.BASE_LR


def get_step_index(cfg, cur_epoch):
    steps = list(cfg.SOLVER.STEPS) + [cfg.SOLVER.MAX_EPOCH]
    for ind, step in enumerate(steps):
        if cur_epoch < step:
            break
    return ind - 1


def get_lr_func(lr_policy):
    policy = "lr_func_" + lr_policy
    if policy not in globals():
        raise NotImplementedError(f"Unknown LR policy: {lr_policy}")
    return globals()[policy]
