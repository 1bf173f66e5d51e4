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

    ``chunk`` > 0 token-chunks the fc1->gelu->fc2 chain (unrolled static
    slices like ``chunked_attention``) with recompute-in-backward, so the
    [N, hidden] activation never lives whole in HBM (154 MB per direction
    at MViT block 0, bs 8) — same math, traffic-only change. Dropout paths
    keep the unchunked lowering (per-chunk rng plumbing isn't worth it for
    recipes that train with drop_rate 0).
    """

    hidden_features: int
    out_features: int
    act_layer: Callable = nn.gelu
    drop_rate: float = 0.0
    chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        fc1 = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="fc1",
        )
        fc2 = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="fc2",
        )
        use_chunk = (
            self.chunk > 0
            and self.drop_rate == 0.0
            and x.ndim == 3
            and x.shape[1] > self.chunk
        )
        if not use_chunk:
            x = self.act_layer(fc1(x))
            if self.drop_rate > 0:
                x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
            x = fc2(x)
            if self.drop_rate > 0:
                x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
            return x

        # Materialize params on a 1-token slice (the tiny dot is DCE'd),
        # then run the chunk loop as pure jax on the bound params — flax
        # modules can't be first-called inside raw jax.checkpoint.
        _ = fc2(self.act_layer(fc1(x[:, :1])))
        w1 = fc1.variables["params"]["kernel"].astype(self.dtype)
        b1 = fc1.variables["params"]["bias"].astype(self.dtype)
        w2 = fc2.variables["params"]["kernel"].astype(self.dtype)
        b2 = fc2.variables["params"]["bias"].astype(self.dtype)

        @jax.checkpoint
        def chain(xc):
            h = self.act_layer(xc.astype(self.dtype) @ w1 + b1)
            return h @ w2 + b2

        n = x.shape[1]
        outs = []
        for i in range(0, n, self.chunk):
            xc = jax.lax.slice_in_dim(x, i, min(i + self.chunk, n), axis=1)
            outs.append(chain(xc))
        if len(outs) == 1:
            return outs[0]
        return jnp.concatenate(outs, axis=1)


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
