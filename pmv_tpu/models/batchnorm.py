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
import jax
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
        s = self.num_splits
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # Per-split running stats, stored flat [S*C] (the reference's
        # split_bn with num_features * num_splits).
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((s * c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((s * c,), jnp.float32)
        )
        x32 = x.astype(jnp.float32)
        if use_running_average:
            # `aggregate_sub_bn_stats` (utils/misc.py:411-428): eval uses the
            # split-mean of means and the law-of-total-variance variance.
            m = ra_mean.value.reshape(s, c)
            v = ra_var.value.reshape(s, c)
            mean = m.mean(axis=0)
            var = (v + m ** 2).mean(axis=0) - mean ** 2
            out = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        else:
            b = x.shape[0]
            assert b % s == 0, (
                f"batch {b} not divisible by num_splits {s}"
            )
            xs = x32.reshape((s, b // s) + x.shape[1:])
            axes = tuple(range(1, xs.ndim - 1))
            mean_s = xs.mean(axis=axes)  # [S, C]
            var_s = xs.var(axis=axes)  # [S, C]
            bshape = (s,) + (1,) * (xs.ndim - 2) + (c,)
            out = (xs - mean_s.reshape(bshape)) * jax.lax.rsqrt(
                var_s.reshape(bshape) + self.epsilon
            )
            out = out.reshape(x.shape)
            if self.is_mutable_collection("batch_stats"):
                mom = self.momentum
                ra_mean.value = mom * ra_mean.value + (1 - mom) * mean_s.reshape(-1)
                ra_var.value = mom * ra_var.value + (1 - mom) * var_s.reshape(-1)
        out = out.astype(self.dtype) * scale + bias
        return out.astype(x.dtype)


def get_norm(cfg):
    """Return a norm constructor keyed by cfg.BN.NORM_TYPE (`get_norm`)."""
    norm_type = cfg.BN.NORM_TYPE
    if norm_type == "batchnorm":
        return lambda **kw: BatchNorm(**kw)
    if norm_type == "sync_batchnorm":
        # Single-controller jit computes batch statistics over the GLOBAL
        # (mesh-sharded) batch — XLA inserts the cross-chip reduction — so
        # NaiveSyncBatchNorm semantics come for free; a separate axis_name
        # pathway is only needed under shard_map/pmap.
        return lambda **kw: BatchNorm(**kw)
    if norm_type == "sub_batchnorm":
        return lambda **kw: SubBatchNorm(num_splits=cfg.BN.NUM_SPLITS, **kw)
    raise NotImplementedError(f"Norm type {norm_type} is not supported")
