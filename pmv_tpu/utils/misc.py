"""Misc helpers (`MViT/slowfast/utils/misc.py` equivalents)."""

import numpy as np

from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)


def params_count(params):
    """Total parameter count of a param pytree."""
    import jax

    return sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
    )


def gpu_mem_usage():
    from pmv_tpu.utils.meters import gpu_mem_usage as _g

    return _g()


def log_model_info(state, cfg):
    """Log params / memory at job start (`misc.py:166-226` get_model_stats).

    FLOPs come from XLA's analytical cost model when available (the
    reference uses fvcore activation counting on a synthetic input).
    """
    n_params = params_count(state.params)
    logger.info("Params: %s", f"{n_params:,}")
    logger.info("Mem: %.2f GB", gpu_mem_usage())


def is_eval_epoch(cfg, cur_epoch):
    """Eval on EVAL_PERIOD boundaries and the final epoch."""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0


def flops_count(fn, *args):
    """Analytical FLOPs of a jitted callable via XLA cost analysis."""
    import jax

    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", -1.0))
    except Exception as e:  # cost analysis is backend-dependent
        logger.warning("flops_count failed: %s", e)
        return -1.0
