"""3D-ResNet building blocks (`MViT/slowfast/models/resnet_helper.py`),
channels-last flax.

Transforms: basic (3x3x3 + 3x3x3), bottleneck (Tx1x1 -> 1x3x3 -> 1x1x1), X3D
(1x1x1 -> Tx3x3 channelwise + SE/swish -> 1x1x1). ResBlock adds projection
shortcut + drop-connect; ResStage stacks per-pathway blocks.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pmv_tpu.models.common import DropPath, round_width


def _conv(dim_out, kernel, stride, padding, groups=1, name=None,
          dtype=jnp.float32, dilation=1):
    # NOTE (round 4, measured): lowering the 1x1x1 convs as token matmuls
    # (dot_general on [N, Cin] @ [Cin, Cout], identical param tree) LOSES
    # end-to-end despite the per-op profile blaming the conv backwards:
    # X3D-M 51.98 -> 60.89 ms/step, SlowFast 157.4 -> 168.7 on v5e. XLA's
    # conv-fusion graph wins again; implementation in git history.
    return nn.Conv(
        dim_out, tuple(kernel), tuple(stride),
        padding=[(p, p) for p in padding],
        kernel_dilation=(1, dilation, dilation),
        feature_group_count=groups, use_bias=False, dtype=dtype, name=name,
    )


class SE(nn.Module):
    """Squeeze-excitation (`operators.py:17-...`): pool, fc, act, fc, sigmoid."""

    dim_in: int
    ratio: float
    relu_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_fc = round_width(self.dim_in, self.ratio, min_width=8, divisor=8)
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(dim_fc, (1, 1, 1), use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s) if self.relu_act else nn.swish(s)
        s = nn.Conv(
            self.dim_in, (1, 1, 1), use_bias=True, dtype=self.dtype, name="fc2"
        )(s)
        return x * nn.sigmoid(s)


class BasicTransform(nn.Module):
    """Tx3x3 + 1x3x3 (`resnet_helper.py` BasicTransform)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        tk = self.temp_kernel_size
        x = _conv(self.dim_out, (tk, 3, 3), (1, self.stride, self.stride),
                  (tk // 2, 1, 1), name="a", dtype=self.dtype)(x)
        x = self.norm(name="a_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_out, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                  name="b", dtype=self.dtype)(x)
        x = self.norm(name="b_bn")(x, use_running_average=not train)
        return x


class BottleneckTransform(nn.Module):
    """Tx1x1 -> 1x3x3 -> 1x1x1 (`resnet_helper.py:264-...`)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    stride_1x1: bool
    dilation: int
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        str1x1, str3x3 = (
            (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        )
        tk = self.temp_kernel_size
        x = _conv(self.dim_inner, (tk, 1, 1), (1, str1x1, str1x1),
                  (tk // 2, 0, 0), name="a", dtype=self.dtype)(x)
        x = self.norm(name="a_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_inner, (1, 3, 3), (1, str3x3, str3x3),
                  (0, self.dilation, self.dilation), groups=self.num_groups,
                  name="b", dtype=self.dtype, dilation=self.dilation)(x)
        x = self.norm(name="b_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                  name="c", dtype=self.dtype)(x)
        x = self.norm(name="c_bn")(x, use_running_average=not train)
        return x


class X3DTransform(nn.Module):
    """1x1x1 -> Tx3x3 channelwise (+SE, swish) -> 1x1x1
    (`resnet_helper.py:120-259`)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    stride_1x1: bool
    dilation: int
    norm: Any
    se_ratio: float = 0.0625
    swish_inner: bool = True
    block_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        str1x1, str3x3 = (
            (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        )
        tk = self.temp_kernel_size
        x = _conv(self.dim_inner, (1, 1, 1), (1, str1x1, str1x1), (0, 0, 0),
                  name="a", dtype=self.dtype)(x)
        x = self.norm(name="a_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_inner, (tk, 3, 3), (1, str3x3, str3x3),
                  (tk // 2, self.dilation, self.dilation),
                  groups=self.num_groups, name="b", dtype=self.dtype,
                  dilation=self.dilation)(x)
        x = self.norm(name="b_bn")(x, use_running_average=not train)
        # SE on every other block ((block_idx + 1) % 2, `resnet_helper.py:233`).
        use_se = (self.block_idx + 1) % 2 == 1
        if self.se_ratio > 0.0 and use_se:
            x = SE(self.dim_inner, self.se_ratio, dtype=self.dtype, name="se")(x)
        x = nn.swish(x) if self.swish_inner else nn.relu(x)
        x = _conv(self.dim_out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                  name="c", dtype=self.dtype)(x)
        x = self.norm(name="c_bn")(x, use_running_average=not train)
        return x


_TRANS_FUNCS = {
    "basic_transform": BasicTransform,
    "bottleneck_transform": BottleneckTransform,
    "x3d_transform": X3DTransform,
}


class ResBlock(nn.Module):
    """Residual block with optional projection shortcut
    (`resnet_helper.py:400-...`)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: Any = None
    block_idx: int = 0
    drop_connect_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        trans_cls = _TRANS_FUNCS[self.trans_func_name]
        kwargs = dict(
            dim_out=self.dim_out,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            norm=self.norm,
            dtype=self.dtype,
        )
        if self.trans_func_name != "basic_transform":
            kwargs.update(
                dim_inner=self.dim_inner,
                num_groups=self.num_groups,
                stride_1x1=self.stride_1x1,
                dilation=self.dilation,
            )
        if self.trans_func_name == "x3d_transform":
            kwargs.update(block_idx=self.block_idx)
        f_x = trans_cls(name="branch2", **kwargs)(x, train=train)
        if self.drop_connect_rate > 0.0:
            f_x = DropPath(self.drop_connect_rate, name="drop_connect")(
                f_x, deterministic=not train
            )
        if self.dim_in != self.dim_out or self.stride != 1:
            shortcut = _conv(
                self.dim_out, (1, 1, 1), (1, self.stride, self.stride),
                (0, 0, 0), name="branch1", dtype=self.dtype,
            )(x)
            shortcut = self.norm(name="branch1_bn")(
                shortcut, use_running_average=not train
            )
            x = shortcut + f_x
        else:
            x = x + f_x
        return nn.relu(x)


class ResStage(nn.Module):
    """Stack of ResBlocks for one pathway (`resnet_helper.py` ResStage,
    single-pathway slice; SlowFast instantiates one per pathway)."""

    dim_in: int
    dim_out: int
    dim_inner: int
    temp_kernel_sizes: Sequence[int]
    stride: int
    num_blocks: int
    num_groups: int
    num_block_temp_kernel: int
    trans_func_name: str = "bottleneck_transform"
    stride_1x1: bool = False
    dilation: int = 1
    norm: Any = None
    drop_connect_rate: float = 0.0
    nonlocal_inds: Sequence[int] = ()
    nonlocal_pool: Sequence[int] = (1, 2, 2)
    nonlocal_instantiation: str = "dot_product"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        # Temporal kernel pattern repeats over blocks, then falls back to 1
        # past num_block_temp_kernel (`resnet_helper.py` ResStage init).
        tks = (
            list(self.temp_kernel_sizes) * self.num_blocks
        )[: self.num_block_temp_kernel] + [1] * (
            self.num_blocks - self.num_block_temp_kernel
        )
        for i in range(self.num_blocks):
            x = ResBlock(
                dim_in=self.dim_in if i == 0 else self.dim_out,
                dim_out=self.dim_out,
                temp_kernel_size=tks[i],
                stride=self.stride if i == 0 else 1,
                trans_func_name=self.trans_func_name,
                dim_inner=self.dim_inner,
                num_groups=self.num_groups,
                stride_1x1=self.stride_1x1,
                dilation=self.dilation,
                norm=self.norm,
                block_idx=i,
                drop_connect_rate=self.drop_connect_rate,
                dtype=self.dtype,
                name=f"res{i}",
            )(x, train=train)
            if i in tuple(self.nonlocal_inds):
                from pmv_tpu.models.nonlocal_block import Nonlocal

                x = Nonlocal(
                    dim_inner=self.dim_out // 2,
                    pool_size=tuple(self.nonlocal_pool),
                    instantiation=self.nonlocal_instantiation,
                    dtype=self.dtype,
                    name=f"nonlocal{i}",
                )(x, train=train)
        return x
