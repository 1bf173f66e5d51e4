"""Shared model building blocks (flax.linen, channels-last NTHWC).

TPU-first equivalents of `MViT/slowfast/models/common.py` (Mlp, DropPath) and
the norm/init helpers used across the model zoo. Compute runs in the configured
activation dtype (bf16 by default); params stay f32.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def trunc_normal_init(std=0.02):
    """Truncated normal (+-2 std), matching torch.nn.init.trunc_normal_."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


class Mlp(nn.Module):
    """Transformer MLP (fc1 -> act -> drop -> fc2 -> drop).

    A token-chunked lowering with recompute-in-backward (the [N, 4C]
    hidden never whole in HBM) was built and measured in round 4 and LOST
    at both bs8 (85.7 -> 88.3/87.6/85.5 ms at chunk 2k/4k/8k) and bs32
    (437.5 -> 447.2): the hidden's traffic overlaps behind compute.
    Implementation in git history; ROADMAP carries the ledger entry.
    """

    hidden_features: int
    out_features: int
    act_layer: Callable = nn.gelu
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="fc1",
        )(x)
        x = self.act_layer(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="fc2",
        )(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


def drop_path(x, rate, deterministic, rng):
    """Stochastic depth: drop the residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


class LayerNorm(nn.Module):
    """LayerNorm with torch-matching eps and f32 stats."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


def round_width(width, multiplier, min_width=1, divisor=1, verbose=False):
    """Round channel width the SlowFast way (`models/utils.py` round_width)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def conv3d(
    features: int,
    kernel: Sequence[int],
    stride: Sequence[int] = (1, 1, 1),
    padding="SAME",
    groups: int = 1,
    use_bias: bool = True,
    dtype=jnp.float32,
    name: Optional[str] = None,
    kernel_init=None,
):
    """3D conv on NTHWC tensors. padding: 'SAME', 'VALID', or explicit
    [(lo,hi)]*3 list matching torch's symmetric padding semantics."""
    return nn.Conv(
        features=features,
        kernel_size=tuple(kernel),
        strides=tuple(stride),
        padding=padding,
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=kernel_init or trunc_normal_init(0.02),
        name=name,
    )


def torch_style_padding(kernel):
    """Explicit per-dim padding = k//2 each side (torch Conv3d padding=k//2)."""
    return [(k // 2, k // 2) for k in kernel]


def max_pool_3d(x, kernel, stride, padding):
    """Max pool on [B, T, H, W, C]. padding: explicit [(lo,hi)]*3."""
    dims = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple(padding) + ((0, 0),)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, pads
    )


def avg_pool_3d(x, kernel, stride, padding, count_include_pad=True):
    """Average pool on [B, T, H, W, C]."""
    dims = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple(padding) + ((0, 0),)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    if count_include_pad:
        denom = 1.0
        for k in kernel:
            denom *= k
        return summed / denom
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
    return summed / counts
