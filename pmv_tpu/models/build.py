"""Model registry + builder (`MViT/slowfast/models/build.py`).

`build_model(cfg)` returns an uninitialized flax module; parameter init /
sharding / replication is the engine's job (single-controller JAX replaces
the reference's per-process cuda placement + DDP wrap at `build.py:69-83`).
"""

import jax.numpy as jnp

from pmv_tpu.utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")


def compute_dtype(cfg):
    # TRAIN.MIXED_PRECISION off -> full f32 activations (the reference's
    # no-autocast mode, `config/defaults.py` TRAIN.MIXED_PRECISION).
    if not cfg.TRAIN.MIXED_PRECISION:
        return jnp.float32
    return {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "float16": jnp.float16,
    }[cfg.TPU.COMPUTE_DTYPE]


def build_model(cfg, hw_switch=False, dtype=None):
    """Construct the flax module named by cfg.MODEL.MODEL_NAME.

    hw_switch selects the portrait specialization (H/W-swapped rel-pos /
    transposed grids) sharing the same parameter tree.
    """
    name = cfg.MODEL.MODEL_NAME
    ctor = MODEL_REGISTRY.get(name)
    if dtype is None:
        dtype = compute_dtype(cfg)
    from pmv_tpu.config.cfg_node import FrozenCfg, freeze_cfg

    if not isinstance(cfg, FrozenCfg):
        cfg = freeze_cfg(cfg)
    return ctor(cfg, hw_switch=hw_switch, dtype=dtype)
