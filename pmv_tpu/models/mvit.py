"""MViT v1/v2 (`MViT/slowfast/models/video_model_builder.py:1726-2171`),
TPU-first.

Key re-design decisions vs the reference:

- channels-last [B, T, H, W, C] input; one static-shape jitted graph per
  (orientation, crop) pair. The reference's per-sample portrait batch split
  (`video_model_builder.py:2075-2096`) is shape-polymorphic torch; here the
  engine runs the *portrait specialization* (hw_switch=True + transposed
  input) as a second jitted program over the same parameters and scatters
  per-sample outputs — exact math parity, fully static shapes.
- rel-pos parameter shapes are fixed at construction from the landscape crop
  geometry; use sites interpolate tables to the runtime extent (trace-time
  constant folding), matching `attention.py:51-64`.
- remat (jax.checkpoint) per block replaces fairscale checkpoint_wrapper
  when cfg.MODEL.ACT_CHECKPOINT is set.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.attention import MultiScaleBlock
from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.common import round_width, trunc_normal_init
from pmv_tpu.models.heads import TransformerBasicHead
from pmv_tpu.models.stem import PatchEmbed
from pmv_tpu.parallel.mesh import data_shard_count


def _compute_mvit_schedule(cfg):
    """Per-block (dim, dim_out, heads, pool kernels/strides, input_size).

    Mirrors the constructor schedule logic at
    `video_model_builder.py:1860-1960` including POOL_KV_STRIDE_ADAPTIVE.
    """
    depth = cfg.MVIT.DEPTH
    embed_dim = cfg.MVIT.EMBED_DIM
    num_heads = cfg.MVIT.NUM_HEADS

    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    for i in range(len(cfg.MVIT.DIM_MUL)):
        dim_mul[cfg.MVIT.DIM_MUL[i][0]] = cfg.MVIT.DIM_MUL[i][1]
    for i in range(len(cfg.MVIT.HEAD_MUL)):
        head_mul[cfg.MVIT.HEAD_MUL[i][0]] = cfg.MVIT.HEAD_MUL[i][1]

    pool_q = [[] for _ in range(depth)]
    pool_kv = [[] for _ in range(depth)]
    stride_q = [[] for _ in range(depth)]
    stride_kv = [[] for _ in range(depth)]

    for i in range(len(cfg.MVIT.POOL_Q_STRIDE)):
        stride_q[cfg.MVIT.POOL_Q_STRIDE[i][0]] = cfg.MVIT.POOL_Q_STRIDE[i][1:]
        if cfg.MVIT.POOL_KVQ_KERNEL is not None:
            pool_q[cfg.MVIT.POOL_Q_STRIDE[i][0]] = cfg.MVIT.POOL_KVQ_KERNEL
        else:
            pool_q[cfg.MVIT.POOL_Q_STRIDE[i][0]] = [
                s + 1 if s > 1 else s for s in cfg.MVIT.POOL_Q_STRIDE[i][1:]
            ]

    pool_kv_stride = list(cfg.MVIT.POOL_KV_STRIDE)
    if cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE is not None:
        _stride_kv = list(cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE)
        pool_kv_stride = []
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _stride_kv = [
                    max(_stride_kv[d] // stride_q[i][d], 1)
                    for d in range(len(_stride_kv))
                ]
            pool_kv_stride.append([i] + _stride_kv)

    for i in range(len(pool_kv_stride)):
        stride_kv[pool_kv_stride[i][0]] = pool_kv_stride[i][1:]
        if cfg.MVIT.POOL_KVQ_KERNEL is not None:
            pool_kv[pool_kv_stride[i][0]] = cfg.MVIT.POOL_KVQ_KERNEL
        else:
            pool_kv[pool_kv_stride[i][0]] = [
                s + 1 if s > 1 else s for s in pool_kv_stride[i][1:]
            ]

    blocks = []
    for i in range(depth):
        num_heads = round_width(num_heads, head_mul[i])
        if cfg.MVIT.DIM_MUL_IN_ATT:
            dim_out = round_width(
                embed_dim, dim_mul[i],
                divisor=round_width(num_heads, head_mul[i]),
            )
        else:
            dim_out = round_width(
                embed_dim, dim_mul[i + 1],
                divisor=round_width(num_heads, head_mul[i + 1]),
            )
        blocks.append(
            dict(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                kernel_q=tuple(pool_q[i]),
                kernel_kv=tuple(pool_kv[i]),
                stride_q=tuple(stride_q[i]),
                stride_kv=tuple(stride_kv[i]),
            )
        )
        embed_dim = dim_out
    return blocks


def get_3d_sincos_pos_embed(embed_dim, grid_size, t_size, cls_token=False):
    """Fixed 3D sin-cos position embedding (`utils.py` in reference)."""
    assert embed_dim % 4 == 0
    embed_dim_spatial = embed_dim // 4 * 3
    embed_dim_temporal = embed_dim // 4

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    pos_embed_spatial = _sincos_2d(embed_dim_spatial, grid)

    grid_t = np.arange(t_size, dtype=np.float32)
    pos_embed_temporal = _sincos_1d(embed_dim_temporal, grid_t)

    pos_embed_temporal = np.repeat(
        pos_embed_temporal[:, None, :], grid_size ** 2, axis=1
    )
    pos_embed_spatial = np.repeat(
        pos_embed_spatial[None, :, :], t_size, axis=0
    )
    pos_embed = np.concatenate([pos_embed_temporal, pos_embed_spatial], axis=-1)
    pos_embed = pos_embed.reshape(-1, embed_dim)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed


def _sincos_2d(embed_dim, grid):
    emb_h = _sincos_1d(embed_dim // 2, grid[0].reshape(-1))
    emb_w = _sincos_1d(embed_dim // 2, grid[1].reshape(-1))
    return np.concatenate([emb_h, emb_w], axis=1)


def _sincos_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


class MViT(nn.Module):
    """Config-driven MViT. Attributes are static (hashable) trace inputs."""

    cfg: Any
    hw_switch: bool = False  # portrait specialization flag
    dtype: jnp.dtype = jnp.float32

    def _geometry(self):
        cfg = self.cfg
        if cfg.TEST.PROCESS:
            rect = cfg.DATA.TEST_CROP_SIZE_RECT
            square = cfg.DATA.TEST_CROP_SIZE
        else:
            rect = cfg.DATA.TRAIN_CROP_SIZE_RECT
            square = cfg.DATA.TRAIN_CROP_SIZE
        if len(rect) != 0:
            spatial = list(rect)
        else:
            spatial = [square, square]
        return [cfg.DATA.NUM_FRAMES, spatial[0], spatial[1]]

    @nn.compact
    def __call__(self, x, train=True, return_features=False):
        cfg = self.cfg
        input_dims = self._geometry()
        patch_stride = list(cfg.MVIT.PATCH_STRIDE)
        if cfg.MVIT.PATCH_2D:
            patch_stride = [1] + patch_stride
        # Construction-time (landscape) patch grid: fixes param shapes.
        patch_dims = [input_dims[i] // patch_stride[i] for i in range(3)]
        num_patches = int(np.prod(patch_dims))
        embed_dim = cfg.MVIT.EMBED_DIM
        cls_on = cfg.MVIT.CLS_EMBED_ON
        depth = cfg.MVIT.DEPTH

        x, thw = PatchEmbed(
            dim_out=embed_dim,
            kernel=cfg.MVIT.PATCH_KERNEL,
            stride=cfg.MVIT.PATCH_STRIDE,
            padding=cfg.MVIT.PATCH_PADDING,
            conv_2d=cfg.MVIT.PATCH_2D,
            use_fold=cfg.TPU.FOLD_STEM,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        T, H, W = thw
        B, N, C = x.shape

        s = 1 if cls_on else 0
        if cfg.MVIT.USE_FIXED_SINCOS_POS:
            sincos = get_3d_sincos_pos_embed(
                embed_dim, patch_dims[1], patch_dims[0], cls_token=cls_on
            )
            pos_fixed = jnp.asarray(sincos, self.dtype)[None]
            x = x + pos_fixed[:, s:, :]

        if cls_on:
            cls_token = self.param(
                "cls_token", trunc_normal_init(0.02), (1, 1, embed_dim)
            )
            cls_tokens = jnp.broadcast_to(
                cls_token.astype(x.dtype), (B, 1, embed_dim)
            )
            if cfg.MVIT.USE_FIXED_SINCOS_POS:
                cls_tokens = cls_tokens + pos_fixed[:, :s, :]
            x = jnp.concatenate([cls_tokens, x], axis=1)

        if cfg.MVIT.USE_ABS_POS:
            if cfg.MVIT.SEP_POS_EMBED:
                pos_spatial = self.param(
                    "pos_embed_spatial", trunc_normal_init(0.02),
                    (1, patch_dims[1] * patch_dims[2], embed_dim),
                )
                pos_temporal = self.param(
                    "pos_embed_temporal", trunc_normal_init(0.02),
                    (1, patch_dims[0], embed_dim),
                )
                pos_embed = jnp.tile(pos_spatial, (1, patch_dims[0], 1)) + (
                    jnp.repeat(
                        pos_temporal, patch_dims[1] * patch_dims[2], axis=1
                    )
                )
                if cls_on:
                    pos_class = self.param(
                        "pos_embed_class", trunc_normal_init(0.02),
                        (1, 1, embed_dim),
                    )
                    pos_embed = jnp.concatenate([pos_class, pos_embed], axis=1)
            else:
                pos_embed = self.param(
                    "pos_embed", trunc_normal_init(0.02),
                    (1, num_patches + s, embed_dim),
                )
            x = x + self._interp_pos_embed(
                pos_embed, patch_dims, (T, H, W), cls_on
            ).astype(x.dtype)

        if cfg.MVIT.DROPOUT_RATE > 0.0:
            x = nn.Dropout(cfg.MVIT.DROPOUT_RATE)(x, deterministic=not train)

        if cfg.MVIT.NORM_STEM:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_stem")(x)

        schedule = _compute_mvit_schedule(cfg)
        dpr = [
            float(r) for r in np.linspace(0, cfg.MVIT.DROPPATH_RATE, depth)
        ]
        # Track the construction-time (landscape) grid for param shapes.
        input_size = list(patch_dims)
        thw = (T, H, W)
        # remat: recompute block activations in backward (replaces the
        # reference's fairscale checkpoint_wrapper at :1958-1959).
        # TPU.REMAT_MIN_SEQ additionally remats just the big early-stage
        # blocks whose stashed attention matrices dominate HBM.
        # static_argnums: 0 is `self`, so (thw, deterministic) are (2, 3).
        remat_cls = nn.remat(MultiScaleBlock, static_argnums=(2, 3))
        for i in range(depth):
            spec = schedule[i]
            block_cls = MultiScaleBlock
            if cfg.MODEL.ACT_CHECKPOINT or (
                cfg.TPU.REMAT_MIN_SEQ > 0
                and int(np.prod(thw)) >= cfg.TPU.REMAT_MIN_SEQ
            ):
                block_cls = remat_cls
            block = block_cls(
                dim=spec["dim"],
                dim_out=spec["dim_out"],
                num_heads=spec["num_heads"],
                input_size=tuple(input_size),
                mlp_ratio=cfg.MVIT.MLP_RATIO,
                qkv_bias=cfg.MVIT.QKV_BIAS,
                drop_rate=cfg.MVIT.DROPOUT_RATE,
                drop_path=dpr[i],
                layer_scale_init_value=cfg.MVIT.LAYER_SCALE_INIT_VALUE,
                kernel_q=spec["kernel_q"],
                kernel_kv=spec["kernel_kv"],
                stride_q=spec["stride_q"],
                stride_kv=spec["stride_kv"],
                mode=cfg.MVIT.MODE,
                has_cls_embed=cls_on,
                pool_first=cfg.MVIT.POOL_FIRST,
                rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
                rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
                rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
                residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
                dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
                separate_qkv=cfg.MVIT.SEPARATE_QKV,
                # switch-auto follows the reference for both orientations'
                # programs (`video_model_builder.py:1786`); the explicit
                # portrait spec (self.hw_switch) also enables it.
                hw_switch=(
                    self.hw_switch
                    or cfg.DATA.TRAIN_CROP_SIZE_RECT_SWITCH_AUTO
                ),
                use_pallas_pools=cfg.MVIT.USE_PALLAS_POOLS,
                pool_impl=cfg.MVIT.POOL_CONV_IMPL,
                sparse_kv=cfg.MVIT.SPARSE_KV_POOL,
                flat_pools=cfg.MVIT.FLAT_POOLS,
                # The gate compares the global (jit-traced) batch, so the
                # per-data-shard config limit scales by the data-axis size.
                flat_pools_max_batch=(
                    cfg.MVIT.FLAT_POOLS_MAX_BATCH * data_shard_count(cfg)
                ),
                flat_ln_vjp=cfg.TPU.FLAT_LN_VJP,
                attn_impl=cfg.MVIT.ATTN_IMPL,
                attn_q_chunk=cfg.TPU.ATTN_Q_CHUNK,
                attn_chunk_remat=cfg.TPU.ATTN_CHUNK_REMAT,
                dtype=self.dtype,
                name=f"blocks.{i}",
            )
            x, thw_out = block(x, thw, not train)
            if block_cls is MultiScaleBlock:
                thw = thw_out
            else:
                # nn.remat boxes non-array outputs into tracers; the q-pool
                # output grid is static, so recompute it (conv/max pool with
                # padding k//2).
                kq, sq = spec["kernel_q"], spec["stride_q"]
                if len(kq) > 0 and (
                    np.prod(kq) > 1 or np.prod(sq) > 1
                ):
                    thw = tuple(
                        (L + 2 * (k // 2) - k) // s + 1
                        for L, k, s in zip(thw, kq, sq)
                    )
            if len(spec["stride_q"]) > 0:
                input_size = [
                    size // stride
                    for size, stride in zip(input_size, spec["stride_q"])
                ]

        x = self.perturb("features", x)  # Grad-CAM tap (visualization)
        if return_features:
            return x, thw

        if cfg.MVIT.USE_MEAN_POOLING:
            if cls_on:
                x = x[:, 1:]
            x = x.mean(axis=1)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        elif cls_on:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            x = x[:, 0]
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            x = x.mean(axis=1)

        x = TransformerBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
            dtype=self.dtype,
            name="head",
        )(x, train=train)
        return x

    def _interp_pos_embed(self, pos_embed, patch_dims, thw, cls_on):
        """Trilinear pos-embed interpolation (`_get_pos_embed`, :2051-2073)."""
        t, h, w = thw
        p_t, p_h, p_w = patch_dims
        if (p_t, p_h, p_w) == (t, h, w):
            return pos_embed
        if cls_on:
            cls_pos = pos_embed[:, :1]
            pos_embed = pos_embed[:, 1:]
        dim = pos_embed.shape[-1]
        grid = pos_embed.reshape(1, p_t, p_h, p_w, dim)
        grid = jax.image.resize(grid, (1, t, h, w, dim), method="trilinear")
        pos_embed = grid.reshape(1, t * h * w, dim)
        if cls_on:
            pos_embed = jnp.concatenate([cls_pos, pos_embed], axis=1)
        return pos_embed


@MODEL_REGISTRY.register(name="MViT")
def build_mvit(cfg, hw_switch=False, dtype=jnp.float32):
    return MViT(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
