"""Precise-BN: recompute BN running stats over N batches before eval.

Equivalent of fvcore `update_bn_stats` as used at `train_net.py:480-501` /
`utils/bn_helper.py:11-77`: run forward passes in train mode over
BN.NUM_BATCHES_PRECISE batches and replace running stats with the *true
average* of per-batch statistics (momentum-free).
"""

import jax
import jax.numpy as jnp

from pmv_tpu.engine import steps
from pmv_tpu.parallel import mesh as mesh_lib
from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)


def calculate_and_update_precise_bn(loader, state, cfg, model, mesh):
    num_batches = min(cfg.BN.NUM_BATCHES_PRECISE, len(loader))
    if num_batches <= 0 or not state.batch_stats:
        return state
    preprocess = steps.make_eval_preprocess_fn(cfg)

    @jax.jit
    def stats_step(params, batch_stats, frames):
        x = preprocess(frames)
        inputs = steps.pack_pathways(cfg, x)
        xs = inputs[0] if len(inputs) == 1 else inputs
        _, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xs, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return updates["batch_stats"]

    # True average of per-batch statistics (fvcore update_bn_stats
    # semantics): flax BN updates running = m*old + (1-m)*batch, so the
    # batch statistic is recovered as (snap - m*old) / (1-m), then averaged
    # momentum-free across batches.
    momentum = 0.9

    @jax.jit
    def recover_batch_stats(snap, old):
        return jax.tree_util.tree_map(
            lambda s, o: (s - momentum * o) / (1.0 - momentum), snap, old
        )

    acc = None
    count = 0
    it = iter(loader)
    for _ in range(num_batches):
        try:
            batch = next(it)
        except StopIteration:
            break
        frames = jax.device_put(batch["frames"], mesh_lib.batch_sharding(mesh))
        snap = stats_step(state.params, state.batch_stats, frames)
        batch_stats = recover_batch_stats(snap, state.batch_stats)
        acc = batch_stats if acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, acc, batch_stats
        )
        count += 1
    if acc is None:
        return state
    mean_stats = jax.tree_util.tree_map(lambda a: a / count, acc)
    logger.info("Updated precise BN stats over %d batches", count)
    return state.replace(batch_stats=mean_stats)
