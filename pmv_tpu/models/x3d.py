"""X3D (`MViT/slowfast/models/video_model_builder.py:1580-1723`), TPU-first.

Progressive-expansion 3D ResNet with channelwise Tx3x3 bottlenecks, SE and
swish. Channels-last; depthwise convs lower to TPU-native NDHWC convolutions.
"""

import math
from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.common import round_width
from pmv_tpu.models.heads import X3DHead
from pmv_tpu.models.resnet_helper import ResStage
from pmv_tpu.models.stem import X3DStem

_MODEL_STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _norm_factory(cfg):
    from pmv_tpu.models.batchnorm import get_norm

    return get_norm(cfg)


class X3D(nn.Module):
    cfg: Any
    hw_switch: bool = False  # conv-only net; engine transposes portrait input
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True, return_features=False):
        cfg = self.cfg
        if isinstance(x, (list, tuple)):
            x = x[0]
        norm = partial(_norm_factory(cfg), dtype=self.dtype)

        dim_c1 = cfg.X3D.DIM_C1
        exp_stage = 2.0
        dim_res2 = (
            round_width(dim_c1, exp_stage, divisor=8)
            if cfg.X3D.SCALE_RES2
            else dim_c1
        )
        dim_res3 = round_width(dim_res2, exp_stage, divisor=8)
        dim_res4 = round_width(dim_res3, exp_stage, divisor=8)
        dim_res5 = round_width(dim_res4, exp_stage, divisor=8)
        block_basis = [
            [1, dim_res2, 2],
            [2, dim_res3, 2],
            [5, dim_res4, 2],
            [3, dim_res5, 2],
        ]

        w_mul = cfg.X3D.WIDTH_FACTOR
        d_mul = cfg.X3D.DEPTH_FACTOR
        dim_res1 = round_width(dim_c1, w_mul)

        # x3d stem: 5x1x1 temporal kernel basis (`_TEMPORAL_KERNEL_BASIS`).
        x = X3DStem(
            dim_out=dim_res1,
            kernel=(5, 3, 3),
            stride=(1, 2, 2),
            padding=(2, 1, 1),
            use_fold=cfg.TPU.FOLD_STEM,
            dtype=self.dtype,
            name="s1.pathway0_stem",
        )(x, train=train)

        dim_in = dim_res1
        dim_out = dim_in
        dim_inner = int(cfg.X3D.BOTTLENECK_FACTOR * dim_res2)
        for stage, block in enumerate(block_basis):
            dim_out = round_width(block[1], w_mul)
            dim_inner = int(cfg.X3D.BOTTLENECK_FACTOR * dim_out)
            n_rep = int(math.ceil(d_mul * block[0])) if d_mul else block[0]
            x = ResStage(
                dim_in=dim_in,
                dim_out=dim_out,
                dim_inner=dim_inner,
                temp_kernel_sizes=(3,),
                stride=block[2],
                num_blocks=n_rep,
                num_groups=dim_inner if cfg.X3D.CHANNELWISE_3x3x3 else cfg.RESNET.NUM_GROUPS,
                num_block_temp_kernel=n_rep,
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=cfg.RESNET.SPATIAL_DILATIONS[stage][0],
                norm=norm,
                drop_connect_rate=cfg.MODEL.DROPCONNECT_RATE
                * (stage + 2) / (len(block_basis) + 1),
                dtype=self.dtype,
                name=f"s{stage + 2}.pathway0",
            )(x, train=train)
            dim_in = dim_out

        x = self.perturb("features", x)  # Grad-CAM tap (visualization)
        if return_features:
            return x
        x = X3DHead(
            dim_inner=dim_inner,
            dim_out=cfg.X3D.DIM_C5,
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            bn_lin5_on=cfg.X3D.BN_LIN5,
            dtype=self.dtype,
            name="head",
        )(x, train=train)
        return x


@MODEL_REGISTRY.register(name="X3D")
def build_x3d(cfg, hw_switch=False, dtype=jnp.float32):
    return X3D(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
