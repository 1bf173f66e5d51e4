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


def root_key(cfg):
    """Root PRNG key for a job: seeded with RNG_SEED, implementation
    selected by TPU.PRNG_IMPL (see `config/defaults.py`). Every in-step
    key derives from this by fold_in/split, so the impl choice propagates
    to all augmentation/dropout randomness."""
    import jax

    impl = getattr(cfg.TPU, "PRNG_IMPL", "") or None
    if impl is None:
        return jax.random.PRNGKey(cfg.RNG_SEED)
    # Typed key: carries the impl through every fold_in/split downstream.
    return jax.random.key(cfg.RNG_SEED, impl=impl)


def gpu_mem_usage():
    from pmv_tpu.utils.meters import gpu_mem_usage as _g

    return _g()


def log_model_info(state, cfg, model=None, example_batch=None):
    """Log params / FLOPs / memory at job start (`misc.py:166-226`
    get_model_stats / log_model_info).

    FLOPs come from XLA's analytical cost model on the jitted eval forward
    (the reference uses fvcore activation counting on a synthetic input).
    XLA counts multiply+add separately, so the logged number is ~2x the
    MAC-counted fvcore figures in `MViT/MODEL_ZOO.md`.
    """
    n_params = params_count(state.params)
    logger.info("Params: %s", f"{n_params:,}")
    logger.info("Mem: %.2f GB", gpu_mem_usage())
    if model is not None and example_batch is not None:
        f = eval_flops_per_clip(state, cfg, model, example_batch)
        if f > 0:
            logger.info(
                "Flops: %.2f G / clip (XLA fwd; ~2x MAC-counted fvcore)",
                f / 1e9,
            )
        a = eval_activations_per_clip(state, cfg, model, example_batch)
        if a > 0:
            logger.info("Activations: %.2f M / clip", a / 1e6)


def eval_flops_per_clip(state, cfg, model, example_batch):
    """Analytic forward FLOPs per clip of the jitted eval step."""
    import jax.numpy as jnp

    from pmv_tpu.engine import steps as steps_mod

    frames = jnp.asarray(example_batch["frames"])
    eval_step = steps_mod.make_eval_step(cfg, model)
    f = flops_count(eval_step, state, frames)
    if f <= 0:
        return f
    return f / frames.shape[0]


def eval_activations_per_clip(state, cfg, model, example_batch):
    """Activation count per clip of the eval forward (fvcore-equivalent)."""
    import jax.numpy as jnp

    from pmv_tpu.engine import steps as steps_mod

    frames = jnp.asarray(example_batch["frames"])
    eval_step = steps_mod.make_eval_step(cfg, model)
    a = activations_count(eval_step, state, frames)
    if a <= 0:
        return a
    return a / frames.shape[0]


def is_eval_epoch(cfg, cur_epoch, multigrid_schedule=None):
    """Eval on EVAL_PERIOD boundaries and the final epoch; under multigrid
    long cycles, eval EVAL_FREQ times per cycle aligned to the cycle end
    (`misc.py:228-250`)."""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max(
                    (s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1
                )
                return (s[-1] - 1 - cur_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0


def activations_count(fn, *args):
    """Activation count of a callable: total output elements of matmul /
    conv ops, matching fvcore's activation_count definition (conv + gemm
    output numel, reported in mega by the caller; reference
    `misc.py:166-226` via `fvcore.nn.activation_count`). Counted on the
    jaxpr, so it is backend-independent and exact for the traced shapes.
    """
    import jax
    import numpy as _np

    _PRIMS = {"dot_general", "conv_general_dilated"}

    def walk(jaxpr):
        total = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name in _PRIMS:
                for ov in eqn.outvars:
                    total += int(_np.prod(ov.aval.shape))
            for v in eqn.params.values():
                # recurse into call/scan/cond/remat sub-jaxprs
                vals = v if isinstance(v, (list, tuple)) else [v]
                for item in vals:
                    inner = getattr(item, "jaxpr", None)
                    if inner is not None:
                        total += walk(inner)
                    elif hasattr(item, "eqns"):
                        total += walk(item)
        return total

    try:
        jaxpr = jax.make_jaxpr(fn)(*args)
        return walk(jaxpr.jaxpr)
    except Exception as e:
        logger.warning("activations_count failed: %s", e)
        return -1


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
