"""Classification heads.

Equivalents of `MViT/slowfast/models/head_helper.py`: TransformerBasicHead
(dropout + linear + eval-time activation), ResNetBasicHead (per-pathway pool,
concat, dropout, fc), X3DHead (conv expansion + pools + fc).
Channels-last throughout.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pmv_tpu.models.common import trunc_normal_init


def head_act(x, act_func):
    if act_func == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if act_func == "sigmoid":
        return jax.nn.sigmoid(x)
    if act_func == "none" or act_func is None:
        return x
    raise NotImplementedError(f"{act_func} head activation unsupported")


class TransformerBasicHead(nn.Module):
    """`head_helper.py:502-577` (without the contrastive projection MLP)."""

    num_classes: int
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    detach_final_fc: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="projection",
        )(x)
        if not train:
            x = head_act(x, self.act_func)
        return x


class ResNetBasicHead(nn.Module):
    """Per-pathway avg pool + concat + dropout + fc (`head_helper.py:9-120`).

    Input: list of [B, T, H, W, C] pathway tensors. pool_size None => global
    adaptive average pool.
    """

    num_classes: int
    pool_size: Optional[Sequence[Sequence[int]]] = None
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train=True):
        pooled = []
        for pathway, x in enumerate(inputs):
            # Global average over (T, H, W); reference uses AvgPool3d with
            # full-extent kernels for fixed sizes — identical for these nets.
            pooled.append(jnp.mean(x, axis=(1, 2, 3)))
        x = jnp.concatenate(pooled, axis=-1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="projection",
        )(x)
        if not train:
            x = head_act(x, self.act_func)
        return x


class ResNetRoIHead(nn.Module):
    """Detection head (`head_helper.py` ResNetRoIHead): temporal average
    pool -> RoIAlign -> spatial max pool -> concat pathways -> dropout + fc.

    Boxes come padded to a fixed count with a validity mask (static shapes);
    masked rows produce zero logits.
    """

    num_classes: int
    resolution: int = 7
    spatial_scale_factor: int = 16
    dropout_rate: float = 0.0
    act_func: str = "sigmoid"
    aligned: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, boxes, box_mask, train=True):
        """inputs: list of [B, T, H, W, C]; boxes: [B, M, 4] pixel coords of
        the input clip; box_mask: [B, M] validity."""
        from pmv_tpu.ops.roi_align import roi_align

        b, m = boxes.shape[:2]
        flat_boxes = boxes.reshape(b * m, 4)
        batch_idx = jnp.repeat(jnp.arange(b), m)
        pooled = []
        for x in inputs:
            feat = x.mean(axis=1)  # temporal average pool [B, H, W, C]
            rois = roi_align(
                feat, flat_boxes, batch_idx,
                (self.resolution, self.resolution),
                spatial_scale=1.0 / self.spatial_scale_factor,
                aligned=self.aligned,
            )  # [B*M, R, R, C]
            pooled.append(jnp.max(rois, axis=(1, 2)))  # spatial max pool
        x = jnp.concatenate(pooled, axis=-1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(
            self.num_classes, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="projection",
        )(x)
        if not train:
            x = head_act(x, self.act_func)
        x = x.reshape(b, m, self.num_classes)
        return x * box_mask[..., None]


class X3DHead(nn.Module):
    """X3D head (`head_helper.py:362-500`): 1x1x1 conv_5 -> pool -> lin_5
    conv expansion -> fc."""

    dim_inner: int
    dim_out: int
    num_classes: int
    dropout_rate: float = 0.5
    act_func: str = "softmax"
    bn_lin5_on: bool = False
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        # conv_5: 1x1x1 expansion to dim_inner + BN + ReLU.
        x = nn.Conv(
            self.dim_inner, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="conv_5",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum, epsilon=self.bn_eps, dtype=self.dtype,
            name="conv_5_bn",
        )(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)  # global avg pool
        # lin_5: 1x1x1 expansion to dim_out (optionally BN'd).
        x = nn.Conv(
            self.dim_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="lin_5",
        )(x)
        if self.bn_lin5_on:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum, epsilon=self.bn_eps,
                dtype=self.dtype, name="lin_5_bn",
            )(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(
            self.num_classes, use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="projection",
        )(x)
        if not train:
            x = head_act(x, self.act_func)
        return x
