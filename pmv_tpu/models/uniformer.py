"""UniFormer (`Uniformer/slowfast/models/uniformer.py`), TPU-first.

4-stage hybrid: stages 1-2 convolutional MHRA blocks (CBlock: depthwise DPE
conv + 1x1x1 sandwich around a depthwise 5x5x5, BN-normed), stages 3-4 global
spatiotemporal self-attention (SABlock) or factorized temporal-then-spatial
attention (SplitSABlock). Channels-last [B, T, H, W, C]; the portrait `pm`
split is handled by the engine (transposed-input specialization over shared
params) — UniFormer has no rel-pos tables so hw_switch only selects the
transposed geometry.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.common import DropPath, trunc_normal_init


def _bn(name, train, dtype):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )


class CMlp(nn.Module):
    """1x1x1-conv MLP (`uniformer.py:100-116`)."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Conv(self.hidden, (1, 1, 1), dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Conv(self.out, (1, 1, 1), dtype=self.dtype, name="fc2")(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Standard MHA on [B, N, C] (`uniformer.py` Attention, timm-style)."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Any = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    impl: str = "batched"  # "batched" | "per_head" (tokens-major, no
    #                         h<->q relayouts; UNIFORMER.ATTN_IMPL)
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False  # t_attn special init (`uniformer.py:397-407`)

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        qkv_init = (
            nn.initializers.zeros if self.zero_init else trunc_normal_init(0.02)
        )
        proj_init = (
            nn.initializers.ones if self.zero_init else trunc_normal_init(0.02)
        )
        if self.impl == "per_head" and self.attn_drop == 0.0:
            # Weight-slice qkv dots + head-sliced einsums: same param tree
            # as Dense(3C)+Dense(C), no [B,N,3,H,D] activation transposes
            # (the relayout copies dominate the batched form's HBM traffic
            # on TPU — tools/hlo_rank.py on the MViT step).
            from pmv_tpu.models.attention import FusedQKVSplitDots

            q, k, v = FusedQKVSplitDots(
                dim_out=C, num_heads=self.num_heads,
                use_bias=self.qkv_bias, kernel_init=qkv_init,
                dtype=self.dtype, name="qkv",
            )(x)
            outs = []
            for hd in range(self.num_heads):
                s = jnp.einsum(
                    "bqc,bkc->bqk", q[:, :, hd] * scale, k[:, :, hd]
                )
                p = nn.softmax(s, axis=-1)
                outs.append(jnp.einsum("bqk,bkc->bqc", p, v[:, :, hd]))
            x = jnp.stack(outs, axis=2).reshape(B, N, C)
        else:
            qkv = nn.Dense(
                3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                kernel_init=qkv_init, name="qkv",
            )(x)
            qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * scale) @ k.transpose(0, 1, 3, 2)
            attn = nn.softmax(attn, axis=-1)
            if self.attn_drop > 0:
                attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            x = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        x = nn.Dense(
            C, dtype=self.dtype, kernel_init=proj_init, name="proj"
        )(x)
        if self.proj_drop > 0:
            x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
        return x


class CBlock(nn.Module):
    """Convolutional MHRA block (`uniformer.py:119-138`)."""

    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        det = not train
        # DPE: depthwise 3x3x3.
        x = x + nn.Conv(
            self.dim, (3, 3, 3), feature_group_count=self.dim,
            dtype=self.dtype, name="pos_embed",
        )(x)
        h = _bn("norm1", train, self.dtype)(x)
        h = nn.Conv(self.dim, (1, 1, 1), dtype=self.dtype, name="conv1")(h)
        h = nn.Conv(
            self.dim, (5, 5, 5), feature_group_count=self.dim,
            dtype=self.dtype, name="attn",
        )(h)
        h = nn.Conv(self.dim, (1, 1, 1), dtype=self.dtype, name="conv2")(h)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic=det)
        h = _bn("norm2", train, self.dtype)(x)
        h = CMlp(
            hidden=int(self.dim * self.mlp_ratio), out=self.dim,
            drop=self.drop, dtype=self.dtype, name="mlp",
        )(h, deterministic=det)
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic=det)
        return x


def _mlp_tail(block, tok, det):
    """[norm2 -> Mlp -> drop_path2 -> residual] tail shared by SA blocks.

    """
    hidden = int(block.dim * block.mlp_ratio)
    from pmv_tpu.models.common import Mlp

    h = nn.LayerNorm(epsilon=1e-6, dtype=block.dtype, name="norm2")(tok)
    h = Mlp(
        hidden_features=hidden,
        out_features=block.dim, drop_rate=block.drop, dtype=block.dtype,
        name="mlp",
    )(h, deterministic=det)
    return tok + DropPath(block.drop_path, name="drop_path2")(
        h, deterministic=det
    )


class SABlock(nn.Module):
    """Global spatiotemporal attention block (`uniformer.py:141-165`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Any = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    attn_impl: str = "batched"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        det = not train
        x = x + nn.Conv(
            self.dim, (3, 3, 3), feature_group_count=self.dim,
            dtype=self.dtype, name="pos_embed",
        )(x)
        B, T, H, W, C = x.shape
        tok = x.reshape(B, T * H * W, C)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(tok)
        h = Attention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, impl=self.attn_impl, dtype=self.dtype,
            name="attn",
        )(h, deterministic=det)
        tok = tok + DropPath(self.drop_path, name="drop_path1")(h, deterministic=det)
        tok = _mlp_tail(self, tok, det)
        return tok.reshape(B, T, H, W, C)


class SplitSABlock(nn.Module):
    """Temporal-then-spatial factorized attention (`uniformer.py:168-203`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Any = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    attn_impl: str = "batched"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        det = not train
        x = x + nn.Conv(
            self.dim, (3, 3, 3), feature_group_count=self.dim,
            dtype=self.dtype, name="pos_embed",
        )(x)
        B, T, H, W, C = x.shape
        # Temporal attention over T for each spatial site.
        t_tok = x.transpose(0, 2, 3, 1, 4).reshape(B * H * W, T, C)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="t_norm")(t_tok)
        h = Attention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, dtype=self.dtype, zero_init=True,
            name="t_attn",
        )(h, deterministic=det)
        t_tok = t_tok + DropPath(self.drop_path, name="drop_path_t")(
            h, deterministic=det
        )
        # Spatial attention over H*W for each frame.
        s_tok = t_tok.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)
        s_tok = s_tok.reshape(B * T, H * W, C)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(s_tok)
        h = Attention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, impl=self.attn_impl, dtype=self.dtype,
            name="attn",
        )(h, deterministic=det)
        s_tok = s_tok + DropPath(self.drop_path, name="drop_path1")(
            h, deterministic=det
        )
        tok = s_tok.reshape(B, T * H * W, C)
        tok = _mlp_tail(self, tok, det)
        return tok.reshape(B, T, H, W, C)


class UniPatchEmbed(nn.Module):
    """Stage patch embed: strided conv + LayerNorm on tokens
    (`uniformer.py:206-260`). ``use_fold`` (TPU.FOLD_STEM) folds the
    stage-1 3-input-channel conv's spatial stride blocks into channels
    (same pathology and fix as the MViT patch stem; see stem.py)."""

    dim_out: int
    patch_size: int
    special: bool = False  # first stage: (3,n,n) kernel, stride (2,n,n)
    std: bool = False
    use_fold: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.patch_size
        if self.special:
            kernel, stride, pad = (3, n, n), (2, n, n), [(1, 1), (0, 0), (0, 0)]
        elif self.std:
            kernel, stride, pad = (3, n, n), (1, n, n), [(1, 1), (0, 0), (0, 0)]
        else:
            kernel, stride, pad = (1, n, n), (1, n, n), [(0, 0), (0, 0), (0, 0)]
        if (
            self.use_fold
            and x.shape[-1] <= 4
            and stride[1] > 1
            and stride[2] > 1
            and x.shape[2] % stride[1] == 0
            and x.shape[3] % stride[2] == 0
        ):
            from pmv_tpu.models.stem import _ProjParams, _fold_patch_conv

            w, b = _ProjParams(
                self.dim_out, kernel, x.shape[-1], name="proj"
            )()
            x = _fold_patch_conv(
                x, w, b, kernel, stride, tuple(p[0] for p in pad),
                self.dtype,
            )
        else:
            x = nn.Conv(
                self.dim_out, kernel, stride, padding=pad, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="proj",
            )(x)
        B, T, H, W, C = x.shape
        tok = x.reshape(B, T * H * W, C)
        tok = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tok)
        return tok.reshape(B, T, H, W, C)


class Uniformer(nn.Module):
    """Config-driven UniFormer (`uniformer.py:263-526`)."""

    cfg: Any
    hw_switch: bool = False  # geometry handled by engine transpose
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True, return_features=False):
        cfg = self.cfg
        depth = list(cfg.UNIFORMER.DEPTH)
        embed_dim = list(cfg.UNIFORMER.EMBED_DIM)
        head_dim = cfg.UNIFORMER.HEAD_DIM
        mlp_ratio = cfg.UNIFORMER.MLP_RATIO
        qkv_bias = cfg.UNIFORMER.QKV_BIAS
        qk_scale = cfg.UNIFORMER.QKV_SCALE
        drop_rate = cfg.UNIFORMER.DROPOUT_RATE
        attn_drop = cfg.UNIFORMER.ATTENTION_DROPOUT_RATE
        split = cfg.UNIFORMER.SPLIT
        std = cfg.UNIFORMER.STD
        num_heads = [dim // head_dim for dim in embed_dim]
        dpr = [float(r) for r in np.linspace(0, cfg.UNIFORMER.DROP_DEPTH_RATE, sum(depth))]

        sa_cls = SplitSABlock if split else SABlock

        # FRAME_BASE (`uniformer_frame.py` Uniformerframe): per-frame 2D
        # patch embeds (1xnxn stride) instead of the 3x4x4/s(2,4,4) stem.
        # UNIFORMER.PATCH_KERNEL overrides the stem patch size when set
        # (`uniformer_mods.py:353-359`).
        pk = cfg.UNIFORMER.PATCH_KERNEL
        patch1 = pk if isinstance(pk, int) else (pk[0] if len(pk) else 4)
        x = UniPatchEmbed(
            dim_out=embed_dim[0], patch_size=patch1,
            special=not cfg.UNIFORMER.FRAME_BASE,
            use_fold=cfg.TPU.FOLD_STEM,
            dtype=self.dtype, name="patch_embed1",
        )(x)
        if drop_rate > 0:
            x = nn.Dropout(drop_rate)(x, deterministic=not train)
        for i in range(depth[0]):
            x = CBlock(
                dim=embed_dim[0], mlp_ratio=mlp_ratio, drop=drop_rate,
                drop_path=dpr[i], dtype=self.dtype, name=f"blocks1.{i}",
            )(x, train=train)
        x = UniPatchEmbed(
            dim_out=embed_dim[1], patch_size=2, std=std,
            dtype=self.dtype, name="patch_embed2",
        )(x)
        for i in range(depth[1]):
            x = CBlock(
                dim=embed_dim[1], mlp_ratio=mlp_ratio, drop=drop_rate,
                drop_path=dpr[i + depth[0]], dtype=self.dtype,
                name=f"blocks2.{i}",
            )(x, train=train)
        x = UniPatchEmbed(
            dim_out=embed_dim[2], patch_size=2, std=std,
            dtype=self.dtype, name="patch_embed3",
        )(x)
        for i in range(depth[2]):
            x = sa_cls(
                dim=embed_dim[2], num_heads=num_heads[2], mlp_ratio=mlp_ratio,
                qkv_bias=qkv_bias, qk_scale=qk_scale, drop=drop_rate,
                attn_drop=attn_drop, drop_path=dpr[i + depth[0] + depth[1]],
                attn_impl=cfg.UNIFORMER.ATTN_IMPL,
                dtype=self.dtype, name=f"blocks3.{i}",
            )(x, train=train)
        x = UniPatchEmbed(
            dim_out=embed_dim[3], patch_size=2, std=std,
            dtype=self.dtype, name="patch_embed4",
        )(x)
        for i in range(depth[3]):
            x = sa_cls(
                dim=embed_dim[3], num_heads=num_heads[3], mlp_ratio=mlp_ratio,
                qkv_bias=qkv_bias, qk_scale=qk_scale, drop=drop_rate,
                attn_drop=attn_drop,
                drop_path=dpr[i + depth[0] + depth[1] + depth[2]],
                attn_impl=cfg.UNIFORMER.ATTN_IMPL,
                dtype=self.dtype, name=f"blocks4.{i}",
            )(x, train=train)

        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm",
        )(x)
        x = self.perturb("features", x)  # Grad-CAM tap (visualization)
        if return_features:
            return x
        # flatten(2).mean(-1): global average over T, H, W.
        x = x.mean(axis=(1, 2, 3))
        x = nn.Dense(
            cfg.MODEL.NUM_CLASSES, dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02), name="head",
        )(x)
        return x


@MODEL_REGISTRY.register(name="Uniformer")
def build_uniformer(cfg, hw_switch=False, dtype=jnp.float32):
    return Uniformer(cfg=cfg, hw_switch=hw_switch, dtype=dtype)


@MODEL_REGISTRY.register(name="Uniformerframe")
def build_uniformer_frame(cfg, hw_switch=False, dtype=jnp.float32):
    """Frame-based (2D-temporal) variant (`uniformer_frame.py`); rect-aware
    inputs work directly — the grid derives from the runtime input shape
    (covers `uniformer_mods.py` too)."""
    assert cfg.UNIFORMER.FRAME_BASE, "Uniformerframe requires UNIFORMER.FRAME_BASE"
    return Uniformer(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
