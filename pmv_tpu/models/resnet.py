"""ResNet (C2D/I3D/Slow) and SlowFast models
(`MViT/slowfast/models/video_model_builder.py:401-459,1089-1577`), TPU-first.

Channels-last [B, T, H, W, C]. SlowFast takes a 2-list [slow, fast] produced
by `pack_pathway_output`. NONLOCAL blocks insert per cfg.NONLOCAL.LOCATION
(single-pathway nets; SlowFast pathways keep the default of none, matching
the released recipes).
"""

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.heads import ResNetBasicHead
from pmv_tpu.models.resnet_helper import ResStage, _conv
from pmv_tpu.models.stem import ResNetBasicStem
from pmv_tpu.models.common import max_pool_3d

_MODEL_STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

_TEMPORAL_KERNEL_BASIS = {
    "2d": [[1], [1], [1], [1], [1]],
    "c2d": [[1], [1], [1], [1], [1]],
    "slow_c2d": [[1], [1], [1], [1], [1]],
    "i3d": [[5], [3], [3, 1], [3, 1], [1, 3]],
    "slow_i3d": [[5], [3], [3, 1], [3, 1], [1, 3]],
    "slow": [[1], [1], [1], [3], [3]],
}

_TEMPORAL_KERNEL_BASIS_SLOWFAST = [
    [[1], [5]],
    [[1], [3]],
    [[1], [3]],
    [[3], [3]],
    [[3], [3]],
]

_POOL1 = {
    "2d": [1, 1, 1],
    "c2d": [2, 1, 1],
    "slow_c2d": [1, 1, 1],
    "i3d": [2, 1, 1],
    "slow_i3d": [1, 1, 1],
    "slow": [1, 1, 1],
}


def _norm_factory(cfg):
    from pmv_tpu.models.batchnorm import get_norm

    return get_norm(cfg)


class ResNetModel(nn.Module):
    """Single-pathway 3D ResNet."""

    cfg: Any
    hw_switch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, train=True, boxes=None, box_mask=None, return_features=False
    ):
        cfg = self.cfg
        if isinstance(x, (list, tuple)):
            x = x[0]
        norm = partial(_norm_factory(cfg), dtype=self.dtype)
        arch = cfg.MODEL.ARCH
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        num_groups = cfg.RESNET.NUM_GROUPS
        width = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = num_groups * width
        tk = _TEMPORAL_KERNEL_BASIS[arch]
        pool1 = _POOL1[arch]

        x = ResNetBasicStem(
            dim_out=width,
            kernel=(tk[0][0], 7, 7),
            stride=(1, 2, 2),
            padding=(tk[0][0] // 2, 3, 3),
            dtype=self.dtype,
            use_fold=cfg.TPU.FOLD_STEM,
            name="s1.pathway0_stem",
        )(x, train=train)

        stage_dims = [
            (width, width * 4, dim_inner, d2),
            (width * 4, width * 8, dim_inner * 2, d3),
            (width * 8, width * 16, dim_inner * 4, d4),
            (width * 16, width * 32, dim_inner * 8, d5),
        ]
        for si, (din, dout, dinner, nblk) in enumerate(stage_dims):
            x = ResStage(
                dim_in=din,
                dim_out=dout,
                dim_inner=dinner,
                temp_kernel_sizes=tuple(tk[si + 1]),
                stride=cfg.RESNET.SPATIAL_STRIDES[si][0],
                num_blocks=nblk,
                num_groups=num_groups,
                num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[si][0],
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=cfg.RESNET.SPATIAL_DILATIONS[si][0],
                norm=norm,
                nonlocal_inds=tuple(cfg.NONLOCAL.LOCATION[si][0]),
                nonlocal_pool=tuple(cfg.NONLOCAL.POOL[si][0]),
                nonlocal_instantiation=cfg.NONLOCAL.INSTANTIATION,
                dtype=self.dtype,
                name=f"s{si + 2}.pathway0",
            )(x, train=train)
            if si == 0 and tuple(pool1) != (1, 1, 1):
                x = max_pool_3d(x, pool1, pool1, [(0, 0)] * 3)

        if return_features:
            return x  # [B, T', H', W', C] pre-head features (SSL backbone)
        if cfg.DETECTION.ENABLE:
            from pmv_tpu.models.heads import ResNetRoIHead

            return ResNetRoIHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                resolution=cfg.DETECTION.ROI_XFORM_RESOLUTION,
                spatial_scale_factor=cfg.DETECTION.SPATIAL_SCALE_FACTOR,
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                dtype=self.dtype,
                name="head",
            )([x], boxes, box_mask, train=train)
        x = ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            dtype=self.dtype,
            name="head",
        )([x], train=train)
        return x


class FuseFastToSlow(nn.Module):
    """Time-strided conv fusion (`video_model_builder.py:401-459`)."""

    dim_in: int  # fast-pathway channels
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: Any = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s, x_f, train=True):
        fuse = _conv(
            self.dim_in * self.fusion_conv_channel_ratio,
            (self.fusion_kernel, 1, 1),
            (self.alpha, 1, 1),
            (self.fusion_kernel // 2, 0, 0),
            name="conv_f2s",
            dtype=self.dtype,
        )(x_f)
        fuse = self.norm(name="bn")(fuse, use_running_average=not train)
        fuse = nn.relu(fuse)
        return jnp.concatenate([x_s, fuse], axis=-1), x_f


class SlowFast(nn.Module):
    """Two-pathway SlowFast (`video_model_builder.py:1089-1360`)."""

    cfg: Any
    hw_switch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True, boxes=None, box_mask=None):
        cfg = self.cfg
        assert isinstance(x, (list, tuple)) and len(x) == 2, (
            "SlowFast expects [slow, fast] pathway inputs"
        )
        x_s, x_f = x
        norm = partial(_norm_factory(cfg), dtype=self.dtype)
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        num_groups = cfg.RESNET.NUM_GROUPS
        width = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = num_groups * width
        beta = cfg.SLOWFAST.BETA_INV
        ratio = cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO
        alpha = cfg.SLOWFAST.ALPHA
        fk = cfg.SLOWFAST.FUSION_KERNEL_SZ
        tk = _TEMPORAL_KERNEL_BASIS_SLOWFAST

        x_s = ResNetBasicStem(
            dim_out=width, kernel=(tk[0][0][0], 7, 7), stride=(1, 2, 2),
            padding=(tk[0][0][0] // 2, 3, 3), dtype=self.dtype,
            use_fold=cfg.TPU.FOLD_STEM,
            name="s1.pathway0_stem",
        )(x_s, train=train)
        x_f = ResNetBasicStem(
            dim_out=width // beta, kernel=(tk[0][1][0], 7, 7), stride=(1, 2, 2),
            padding=(tk[0][1][0] // 2, 3, 3), dtype=self.dtype,
            use_fold=cfg.TPU.FOLD_STEM,
            name="s1.pathway1_stem",
        )(x_f, train=train)
        x_s, x_f = FuseFastToSlow(
            dim_in=width // beta, fusion_conv_channel_ratio=ratio,
            fusion_kernel=fk, alpha=alpha, norm=norm, dtype=self.dtype,
            name="s1_fuse",
        )(x_s, x_f, train=train)

        stage_specs = [
            # (slow_in_base, slow_out, inner, depth)
            (width, width * 4, dim_inner, d2),
            (width * 4, width * 8, dim_inner * 2, d3),
            (width * 8, width * 16, dim_inner * 4, d4),
            (width * 16, width * 32, dim_inner * 8, d5),
        ]
        for si, (din, dout, dinner, nblk) in enumerate(stage_specs):
            x_s = ResStage(
                dim_in=din + din // beta * ratio,
                dim_out=dout,
                dim_inner=dinner,
                temp_kernel_sizes=tuple(tk[si + 1][0]),
                stride=cfg.RESNET.SPATIAL_STRIDES[si][0],
                num_blocks=nblk,
                num_groups=num_groups,
                num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[si][0],
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=cfg.RESNET.SPATIAL_DILATIONS[si][0],
                norm=norm,
                dtype=self.dtype,
                name=f"s{si + 2}.pathway0",
            )(x_s, train=train)
            x_f = ResStage(
                dim_in=din // beta,
                dim_out=dout // beta,
                dim_inner=dinner // beta,
                temp_kernel_sizes=tuple(tk[si + 1][1]),
                stride=cfg.RESNET.SPATIAL_STRIDES[si][1]
                if len(cfg.RESNET.SPATIAL_STRIDES[si]) > 1
                else cfg.RESNET.SPATIAL_STRIDES[si][0],
                num_blocks=nblk,
                num_groups=num_groups,
                num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[si][-1],
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=cfg.RESNET.SPATIAL_DILATIONS[si][-1],
                norm=norm,
                dtype=self.dtype,
                name=f"s{si + 2}.pathway1",
            )(x_f, train=train)
            if si < 3:
                x_s, x_f = FuseFastToSlow(
                    dim_in=dout // beta, fusion_conv_channel_ratio=ratio,
                    fusion_kernel=fk, alpha=alpha, norm=norm, dtype=self.dtype,
                    name=f"s{si + 2}_fuse",
                )(x_s, x_f, train=train)

        if cfg.DETECTION.ENABLE:
            from pmv_tpu.models.heads import ResNetRoIHead

            return ResNetRoIHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                resolution=cfg.DETECTION.ROI_XFORM_RESOLUTION,
                spatial_scale_factor=cfg.DETECTION.SPATIAL_SCALE_FACTOR,
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                dtype=self.dtype,
                name="head",
            )([x_s, x_f], boxes, box_mask, train=train)
        x = ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            dtype=self.dtype,
            name="head",
        )([x_s, x_f], train=train)
        return x


@MODEL_REGISTRY.register(name="ResNet")
def build_resnet(cfg, hw_switch=False, dtype=jnp.float32):
    return ResNetModel(cfg=cfg, hw_switch=hw_switch, dtype=dtype)


@MODEL_REGISTRY.register(name="SlowFast")
def build_slowfast(cfg, hw_switch=False, dtype=jnp.float32):
    return SlowFast(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
