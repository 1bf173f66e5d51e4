"""Optimizer construction (`MViT/slowfast/models/optimizer.py`), on optax.

Reproduces the reference's parameter-group semantics:
- BN/1-D params and biases get zero weight decay when SOLVER.ZERO_WD_1D_PARAM
  (`optimizer.py:41-99`); BN params use BN.WEIGHT_DECAY otherwise.
- pos embeds / cls token / rel-pos tables get zero wd when
  MVIT.ZERO_DECAY_POS_CLS (the model's `no_weight_decay` set).
- layer-wise LR decay keyed to MViT block depth (`optimizer.py:151-200`).
- SGD (momentum+nesterov+dampening), Adam, AdamW, LARS wrapper.

LR scheduling is per-iteration: the engine passes epoch_exact into
`get_epoch_lr` and the optax injects it via a schedule-free scale that reads
a mutable scalar (we use optax.inject_hyperparams).
"""

import jax
import optax

from pmv_tpu.utils import lr_policy


def get_epoch_lr(cur_epoch, cfg):
    """LR at a fractional epoch (`optimizer.py` get_epoch_lr)."""
    return lr_policy.get_lr_at_epoch(cfg, cur_epoch)


def _is_bn_param(path):
    joined = "/".join(str(p) for p in path).lower()
    return (
        "batchnorm" in joined
        or "bn" in joined.split("/")[-2:][0].lower()
        or "batch_stats" in joined
        or any(seg.endswith("_bn") or seg == "bn" for seg in joined.split("/"))
    )


_NO_DECAY_NAMES = (
    "pos_embed",
    "pos_embed_spatial",
    "pos_embed_temporal",
    "pos_embed_class",
    "rel_pos_h",
    "rel_pos_w",
    "rel_pos_t",
    "cls_token",
)


def make_wd_mask(params, cfg):
    """Boolean pytree: True where weight decay applies."""

    def decide(path, p):
        names = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
        leaf = names[-1] if names else ""
        joined = "/".join(names)
        if cfg.MVIT.ZERO_DECAY_POS_CLS and any(
            n in joined for n in _NO_DECAY_NAMES
        ):
            return False
        if cfg.SOLVER.ZERO_WD_1D_PARAM and (p.ndim <= 1 or leaf == "bias"):
            return False
        if _is_bn_param(names):
            # BN params use BN.WEIGHT_DECAY (0.0 by default).
            return cfg.BN.WEIGHT_DECAY > 0.0
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_layer_decay_scales(params, cfg):
    """Per-param LR scale = LAYER_DECAY ** (num_layers - layer_id)
    (`optimizer.py:151-200` get_param_groups)."""
    decay = cfg.SOLVER.LAYER_DECAY
    depth = cfg.MVIT.DEPTH
    num_layers = depth + 1

    def layer_id(path_names):
        joined = "/".join(path_names)
        if any(
            n in joined
            for n in ("cls_token", "pos_embed", "patch_embed")
        ):
            return 0
        for name in path_names:
            if name.startswith("blocks."):
                return int(name.split(".")[1]) + 1
        return num_layers

    def scale(path, p):
        names = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
        return decay ** (num_layers - layer_id(names))

    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_pytree(scales):
    """Multiply updates elementwise by a static per-leaf scalar pytree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, s: u * s, updates, scales
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def construct_optimizer(params, cfg):
    """Build the optax chain. Returns (tx, static_info).

    The learning rate is injected per step via optax.inject_hyperparams so
    the engine can set the exact per-iteration LR (epoch_exact granularity).
    """
    method = cfg.SOLVER.OPTIMIZING_METHOD
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_mask = make_wd_mask(params, cfg)

    chain = []
    if cfg.SOLVER.CLIP_GRAD_VAL is not None:
        chain.append(optax.clip(cfg.SOLVER.CLIP_GRAD_VAL))
    elif cfg.SOLVER.CLIP_GRAD_L2NORM is not None:
        chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRAD_L2NORM))

    if method == "sgd":
        chain.append(
            optax.trace(
                decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV
            )
        )
        # torch-SGD couples wd into the gradient before momentum; reference
        # uses per-group wd. Emulate with masked additive decay pre-momentum.
        chain.insert(
            len(chain) - 1, optax.add_decayed_weights(wd, mask=wd_mask)
        )
    elif method == "adam":
        chain.append(optax.scale_by_adam(*cfg.SOLVER.BETAS))
        chain.append(optax.add_decayed_weights(wd, mask=wd_mask))
    elif method in ("adamw", "mt_adamw"):
        chain.append(optax.scale_by_adam(*cfg.SOLVER.BETAS))
        chain.append(optax.add_decayed_weights(wd, mask=wd_mask))
    else:
        raise NotImplementedError(f"Optimizer {method} not supported")

    if cfg.SOLVER.LAYER_DECAY < 1.0:
        chain.append(scale_by_pytree(make_layer_decay_scales(params, cfg)))

    if cfg.SOLVER.LARS_ON and method == "sgd":
        # Trust-ratio scaling (LARS wrapper, `optimizer.py` LARS).
        chain.append(optax.scale_by_trust_ratio())

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            *chain, optax.scale_by_learning_rate(learning_rate)
        )
    )(learning_rate=cfg.SOLVER.BASE_LR)
    return tx


def set_lr(opt_state, new_lr):
    """Functionally set the injected LR (reference `set_lr`). Jit-safe."""
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": new_lr}
    )
