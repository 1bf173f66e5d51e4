"""BatchNorm variants for NTHWC video tensors.

TPU-native equivalents of `MViT/slowfast/models/batchnorm_helper.py`:
- plain BatchNorm3d  -> flax BatchNorm (stats over B,T,H,W)
- NaiveSyncBatchNorm3d -> BatchNorm with axis_name (psum'd batch stats over
  the mesh 'data' axis; XLA lowers to ICI collectives)
- SubBatchNorm3d -> stats over batch splits during training, aggregated
  running stats for eval (`batchnorm_helper.py:40-112`).

torch BN defaults: eps=1e-5, momentum=0.1 (flax momentum = 1 - 0.1 = 0.9).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class BatchNorm(nn.Module):
    """BatchNorm over (B, T, H, W) with optional cross-replica sync."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None  # e.g. "data" for sync BN
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, use_running_average=True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name if not use_running_average else None,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
        )(x)


class SubBatchNorm(nn.Module):
    """BN whose training stats are computed within NUM_SPLITS batch splits.

    Matches SubBatchNorm3d semantics: a shared affine, split statistics in
    training, and aggregated (mean of split) running stats used for eval.
    Implemented by folding the split dimension into the feature axis during
    the stats computation.
    """

    num_splits: int = 1
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average=True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        bn = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            use_scale=False,
            use_bias=False,
            name="split_bn",
        )
        if use_running_average or self.num_splits == 1:
            out = bn(x)
        else:
            b = x.shape[0]
            assert b % self.num_splits == 0, (
                f"batch {b} not divisible by num_splits {self.num_splits}"
            )
            # [S*B', ...] -> [B', ..., S*C]: per-split statistics.
            xs = x.reshape((self.num_splits, b // self.num_splits) + x.shape[1:])
            xs = jnp.moveaxis(xs, 0, -2).reshape(
                (b // self.num_splits,) + x.shape[1:-1] + (self.num_splits * c,)
            )
            out = bn(xs)
            out = out.reshape(
                (b // self.num_splits,) + x.shape[1:-1] + (self.num_splits, c)
            )
            out = jnp.moveaxis(out, -2, 0).reshape(x.shape)
        return out * scale + bias


def get_norm(cfg):
    """Return a norm constructor keyed by cfg.BN.NORM_TYPE (`get_norm`)."""
    norm_type = cfg.BN.NORM_TYPE
    if norm_type == "batchnorm":
        return lambda **kw: BatchNorm(**kw)
    if norm_type == "sync_batchnorm":
        return lambda **kw: BatchNorm(axis_name="data", **kw)
    if norm_type == "sub_batchnorm":
        return lambda **kw: SubBatchNorm(num_splits=cfg.BN.NUM_SPLITS, **kw)
    raise NotImplementedError(f"Norm type {norm_type} is not supported")
