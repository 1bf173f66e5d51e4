"""Model stems (`MViT/slowfast/models/stem_helper.py`), channels-last."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pmv_tpu.models.common import trunc_normal_init


class PatchEmbed(nn.Module):
    """3D conv patch embed -> token sequence (`stem_helper.py` PatchEmbed).

    Input [B, T, H, W, C]; returns (tokens [B, N, D], (T', H', W')).
    """

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    conv_2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.conv_2d:
            # Per-frame 2D conv: fold T into batch.
            b, t, h, w, c = x.shape
            x = x.reshape(b * t, h, w, c)
            pad = [(p, p) for p in self.padding[-2:]]
            x = nn.Conv(
                self.dim_out, tuple(self.kernel[-2:]), tuple(self.stride[-2:]),
                padding=pad, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="proj",
            )(x)
            x = x.reshape(b, t, x.shape[1], x.shape[2], self.dim_out)
        else:
            pad = [(p, p) for p in self.padding]
            x = nn.Conv(
                self.dim_out, tuple(self.kernel), tuple(self.stride),
                padding=pad, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="proj",
            )(x)
        thw = (x.shape[1], x.shape[2], x.shape[3])
        return x.reshape(x.shape[0], -1, self.dim_out), thw


class ResNetBasicStem(nn.Module):
    """Conv + BN + ReLU + maxpool stem (`stem_helper.py` ResNetBasicStem)."""

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        pad = [(p, p) for p in self.padding]
        x = nn.Conv(
            self.dim_out, tuple(self.kernel), tuple(self.stride), padding=pad,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype, name="bn",
        )(x)
        x = nn.relu(x)
        # 1x3x3 max pool stride 1,2,2 (reference pool_layer).
        import jax.lax as lax

        x = lax.reduce_window(
            x, -jnp.inf, lax.max,
            (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return x


class X3DStem(nn.Module):
    """Channel-separated stem: 1xkxk spatial conv then kx1x1 depthwise
    temporal conv (`stem_helper.py` X3DStem)."""

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(
            self.dim_out,
            (1, self.kernel[1], self.kernel[2]),
            (1, self.stride[1], self.stride[2]),
            padding=[(0, 0), (self.padding[1], self.padding[1]),
                     (self.padding[2], self.padding[2])],
            use_bias=False, dtype=self.dtype, name="conv_xy",
        )(x)
        x = nn.Conv(
            self.dim_out,
            (self.kernel[0], 1, 1),
            (self.stride[0], 1, 1),
            padding=[(self.padding[0], self.padding[0]), (0, 0), (0, 0)],
            feature_group_count=self.dim_out,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)
