"""CSN (Channel-Separated Networks) and R(2+1)D video backbones.

The reference exposes these families through PyTorchVideo builders
(`MViT/slowfast/models/ptv_model_builder.py:521-603` PTVCSN,
`:606-699` PTVR2plus1D). Here they are native channels-last flax modules
built on the framework's norm factory and heads — no wrapper library.

Architecture parity with the reference builders:

- CSN (ir-CSN): ResNet bottleneck stages where conv_b is a *depthwise*
  3x3x3 conv (`stage_conv_b_width_per_group=1`), stem 3x7x7/s(1,2,2) +
  1x3x3/s(1,2,2) max pool, per-stage spatial stride (1,2,2,2) and temporal
  stride (1,2,2,2) carried by conv_b.
- R(2+1)D: bottleneck stages whose conv_b factors the 3x3x3 into a 1x3x3
  spatial conv and a 3x1x1 temporal conv with a BN+ReLU in between; the
  middle width matches the 3D conv's parameter count
  (M = t*d^2*C^2 / (d^2*C + t*C), Tran et al. CVPR'18 eq. 3). Stem
  1x7x7/s(1,2,2) with no pool, spatial stride (2,2,2,2), temporal stride
  (1,1,2,2).

Both are registered under the reference's model names (PTVCSN /
PTVR2plus1D) and plain aliases (CSN / R2Plus1D); configs select them via
MODEL.MODEL_NAME exactly as upstream.
"""

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.common import max_pool_3d
from pmv_tpu.models.heads import ResNetBasicHead
from pmv_tpu.models.resnet_helper import _conv

_MODEL_STAGE_DEPTH = {
    18: (2, 2, 2, 2),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class CSNTransform(nn.Module):
    """1x1x1 -> depthwise 3x3x3 (strided) -> 1x1x1 bottleneck."""

    dim_out: int
    dim_inner: int
    stride: Sequence[int]  # (t, s, s) applied on conv_b
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        x = _conv(self.dim_inner, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                  name="a", dtype=self.dtype)(x)
        x = self.norm(name="a_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_inner, (3, 3, 3), tuple(self.stride), (1, 1, 1),
                  groups=self.dim_inner, name="b", dtype=self.dtype)(x)
        x = self.norm(name="b_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                  name="c", dtype=self.dtype)(x)
        x = self.norm(name="c_bn")(x, use_running_average=not train)
        return x


class R2Plus1dTransform(nn.Module):
    """1x1x1 -> (1x3x3 spatial ∘ 3x1x1 temporal) -> 1x1x1 bottleneck."""

    dim_out: int
    dim_inner: int
    stride: Sequence[int]  # (t, s, s): s on the spatial conv, t on temporal
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        st, ss = self.stride[0], self.stride[1]
        x = _conv(self.dim_inner, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                  name="a", dtype=self.dtype)(x)
        x = self.norm(name="a_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        # Parameter-matched middle width (Tran et al. CVPR'18 eq. 3 with
        # t=3, d=3, Cin=Cout=dim_inner).
        c = self.dim_inner
        mid = (3 * 9 * c * c) // (9 * c + 3 * c)
        x = _conv(mid, (1, 3, 3), (1, ss, ss), (0, 1, 1),
                  name="b_xy", dtype=self.dtype)(x)
        x = self.norm(name="b_xy_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_inner, (3, 1, 1), (st, 1, 1), (1, 0, 0),
                  name="b_t", dtype=self.dtype)(x)
        x = self.norm(name="b_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(self.dim_out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                  name="c", dtype=self.dtype)(x)
        x = self.norm(name="c_bn")(x, use_running_average=not train)
        return x


class _SepBlock(nn.Module):
    """Residual wrapper with projection shortcut (temporal-stride aware)."""

    dim_in: int
    dim_out: int
    dim_inner: int
    stride: Sequence[int]
    transform: Any
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        f_x = self.transform(
            dim_out=self.dim_out, dim_inner=self.dim_inner,
            stride=self.stride, norm=self.norm, dtype=self.dtype,
            name="branch2",
        )(x, train=train)
        if self.dim_in != self.dim_out or tuple(self.stride) != (1, 1, 1):
            shortcut = _conv(self.dim_out, (1, 1, 1), tuple(self.stride),
                             (0, 0, 0), name="branch1", dtype=self.dtype)(x)
            shortcut = self.norm(name="branch1_bn")(
                shortcut, use_running_average=not train
            )
            x = shortcut + f_x
        else:
            x = x + f_x
        return nn.relu(x)


class SeparatedConvNet(nn.Module):
    """Shared CSN / R(2+1)D trunk: stem + 4 bottleneck stages + head."""

    cfg: Any
    variant: str  # "csn" | "r2plus1d"
    hw_switch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True, boxes=None, box_mask=None):
        cfg = self.cfg
        if isinstance(x, (list, tuple)):
            x = x[0]
        from pmv_tpu.models.batchnorm import get_norm

        norm = partial(get_norm(cfg), dtype=self.dtype)
        width = cfg.RESNET.WIDTH_PER_GROUP
        depths = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        if self.variant == "csn":
            stem_kernel, stem_pad = (3, 7, 7), (1, 3, 3)
            spatial_strides = (1, 2, 2, 2)
            temporal_strides = (1, 2, 2, 2)
            transform = CSNTransform
        else:
            stem_kernel, stem_pad = (1, 7, 7), (0, 3, 3)
            spatial_strides = (2, 2, 2, 2)
            temporal_strides = (1, 1, 2, 2)
            transform = R2Plus1dTransform

        if (
            cfg.TPU.FOLD_STEM
            and x.shape[2] % 2 == 0
            and x.shape[3] % 2 == 0
        ):
            # 3-input-channel stem conv: folded lowering (see stem.py;
            # same pathology/fix as the ResNet stems). Identical param
            # path/shape/init to the nn.Conv it replaces.
            from pmv_tpu.models.stem import _StemConvParams, _fold_patch_conv

            w = _StemConvParams(
                width, stem_kernel, x.shape[-1], name="s1.stem_conv"
            )()
            x = _fold_patch_conv(
                x, w, jnp.zeros((width,), w.dtype), stem_kernel,
                (1, 2, 2), stem_pad, self.dtype,
            )
        else:
            x = _conv(width, stem_kernel, (1, 2, 2), stem_pad,
                      name="s1.stem_conv", dtype=self.dtype)(x)
        x = norm(name="s1.stem_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        if self.variant == "csn":
            x = max_pool_3d(x, (1, 3, 3), (1, 2, 2),
                            [(0, 0), (1, 1), (1, 1)])

        dim_in = width
        for si, nblk in enumerate(depths):
            dim_inner = width * (2 ** si)
            dim_out = dim_inner * 4
            for bi in range(nblk):
                stride = (
                    (temporal_strides[si], spatial_strides[si],
                     spatial_strides[si])
                    if bi == 0 else (1, 1, 1)
                )
                x = _SepBlock(
                    dim_in=dim_in if bi == 0 else dim_out,
                    dim_out=dim_out,
                    dim_inner=dim_inner,
                    stride=stride,
                    transform=transform,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"s{si + 2}.res{bi}",
                )(x, train=train)
            dim_in = dim_out

        return ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            dtype=self.dtype,
            name="head",
        )([x], train=train)


def _build_csn(cfg, hw_switch=False, dtype=jnp.float32):
    return SeparatedConvNet(cfg=cfg, variant="csn", hw_switch=hw_switch,
                            dtype=dtype)


def _build_r2plus1d(cfg, hw_switch=False, dtype=jnp.float32):
    return SeparatedConvNet(cfg=cfg, variant="r2plus1d",
                            hw_switch=hw_switch, dtype=dtype)


MODEL_REGISTRY.register(_build_csn, name="PTVCSN")
MODEL_REGISTRY.register(_build_csn, name="CSN")
MODEL_REGISTRY.register(_build_r2plus1d, name="PTVR2plus1D")
MODEL_REGISTRY.register(_build_r2plus1d, name="R2Plus1D")
