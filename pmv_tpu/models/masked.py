"""Masked video pretraining (`MViT/slowfast/models/masked.py` MaskMViT).

MaskFeat-style functional re-design: a per-sample random token mask replaces
masked patch embeddings with a learned mask token; the backbone runs the
full (static-shape) sequence — TPU-friendly, no gather/scatter of variable
token counts — and a separate prediction head regresses HOG descriptors of
the masked patches (`masked.py` PRED_HOG path; HOG computed on-device, the
reference computes it per-sample on CPU workers).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.common import trunc_normal_init
from pmv_tpu.models.mvit import MViT


def hog_targets(frames, nbins=9, cell_sz=8):
    """Per-cell HOG descriptors of video frames, fully on-device.

    frames: [B, T, H, W, C] float (normalized ok). Returns
    [B, T, H//cell, W//cell, C*nbins] L2-normalized histograms
    (`masked.py` HOG layer semantics: per-channel HOG, 9 unsigned bins).
    """
    gx = frames[:, :, :, 2:] - frames[:, :, :, :-2]
    gx = jnp.pad(gx, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    gy = frames[:, :, 2:] - frames[:, :, :-2]
    gy = jnp.pad(gy, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    mag = jnp.sqrt(gx ** 2 + gy ** 2 + 1e-12)
    ang = jnp.arctan2(gy, gx) % np.pi  # unsigned orientation [0, pi)
    bin_idx = jnp.floor(ang / (np.pi / nbins)).astype(jnp.int32) % nbins

    b, t, h, w, c = frames.shape
    hc, wc = h // cell_sz, w // cell_sz
    # One-hot bin weighting, then cell-sum pooling.
    onehot = jax.nn.one_hot(bin_idx, nbins, dtype=frames.dtype)
    weighted = onehot * mag[..., None]  # [B,T,H,W,C,nbins]
    weighted = weighted[:, :, : hc * cell_sz, : wc * cell_sz]
    weighted = weighted.reshape(b, t, hc, cell_sz, wc, cell_sz, c, nbins)
    hist = weighted.sum(axis=(3, 5))  # [B,T,hc,wc,C,nbins]
    hist = hist.reshape(b, t, hc, wc, c * nbins)
    return hist / (jnp.linalg.norm(hist, axis=-1, keepdims=True) + 1e-6)


class MSSeparateHead(nn.Module):
    """Per-target prediction head (`head_helper.py:580-690`)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return nn.Dense(
            self.out_dim, dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02), name="projection",
        )(x)


class MaskMViT(nn.Module):
    """MViT backbone + mask-token substitution + HOG prediction head."""

    cfg: Any
    hw_switch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        """x: [B, T, H, W, C] frames; mask: [B, N_tokens] bool (True=masked).

        Returns (pred_hog [B, N, D_hog], target_hog, mask).
        """
        cfg = self.cfg
        if len(cfg.MVIT.PATCH_STRIDE) == 2:  # 2-D image MaskFeat (in1k)
            patch_t, (patch_h, patch_w) = 1, cfg.MVIT.PATCH_STRIDE
        else:
            patch_t, patch_h, patch_w = cfg.MVIT.PATCH_STRIDE
        b = x.shape[0]
        t_tok = max(cfg.DATA.NUM_FRAMES // patch_t, 1)
        h_tok = x.shape[2] // patch_h
        w_tok = x.shape[3] // patch_w
        n_tok = t_tok * h_tok * w_tok

        if mask is None:
            key = self.make_rng("mask")
            ratio = cfg.AUG.MASK_RATIO or 0.4
            scores = jax.random.uniform(key, (b, n_tok))
            k = int(n_tok * ratio)
            thresh = jnp.sort(scores, axis=1)[:, k : k + 1]
            mask = scores < thresh

        if cfg.MASK.PRED_HOG:
            # HOG targets on the patch grid: cell size = spatial patch
            # stride, averaged over the frames inside each temporal patch.
            hog = hog_targets(
                x.astype(jnp.float32), nbins=cfg.MASK.HOG_NBINS,
                cell_sz=patch_h,
            )
            bt = hog.shape[1]
            hog = hog.reshape(
                b, t_tok, bt // t_tok, h_tok, w_tok, hog.shape[-1]
            ).mean(axis=2)
            target = hog.reshape(b, n_tok, -1)
        else:
            # MAE-style pixel targets (`masked.py:219-243`
            # _get_pixel_label_3d): one frame per temporal patch when
            # TIME_STRIDE_LOSS, per-patch mean/var normalization when
            # NORM_PRED_PIXEL.
            frames_t = (
                x[:, ::patch_t] if cfg.MASK.TIME_STRIDE_LOSS
                else x
            ).astype(jnp.float32)
            tt = frames_t.shape[1]
            pt = 1 if cfg.MASK.TIME_STRIDE_LOSS else patch_t
            patches = frames_t[:, :, : h_tok * patch_h, : w_tok * patch_w]
            patches = patches.reshape(
                b, tt // pt, pt, h_tok, patch_h, w_tok, patch_w, -1
            )
            # [B, t_tok, h_tok, w_tok, pt*ph*pw*C]
            patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                b, n_tok, -1
            )
            if cfg.MASK.NORM_PRED_PIXEL:
                mean = patches.mean(axis=-1, keepdims=True)
                var = patches.var(axis=-1, keepdims=True)
                patches = (patches - mean) / jnp.sqrt(var + 1e-6)
            target = patches

        # Backbone with mask-token substitution right after patch embed: we
        # mask the *input pixels* of masked patches instead of patch tokens
        # (equivalent up to the conv stem overlap; keeps the backbone
        # untouched) and add a learned bias so masked regions aren't zeros.
        mask_token = self.param(
            "mask_token", trunc_normal_init(0.02), (1, 1, x.shape[-1])
        )
        grid_mask = mask.reshape(b, t_tok, h_tok, w_tok)
        pixel_mask = jnp.repeat(grid_mask, patch_t, axis=1)
        pixel_mask = jnp.repeat(pixel_mask, patch_h, axis=2)
        pixel_mask = jnp.repeat(pixel_mask, patch_w, axis=3)
        pixel_mask = pixel_mask[:, : x.shape[1], : x.shape[2], : x.shape[3]]
        x_masked = jnp.where(
            pixel_mask[..., None],
            mask_token[0, 0].astype(x.dtype),
            x,
        )

        feats, thw = MViT(cfg=cfg, hw_switch=self.hw_switch, dtype=self.dtype,
                          name="backbone")(
            x_masked, train=train, return_features=True
        )
        if cfg.MVIT.CLS_EMBED_ON:
            feats = feats[:, 1:]
        # Project token features back onto the full patch grid (the backbone
        # may have pooled Q; upsample token grid to n_tok).
        tq, hq, wq = thw
        if (tq, hq, wq) != (t_tok, h_tok, w_tok):
            grid = feats.reshape(b, tq, hq, wq, -1)
            grid = jax.image.resize(
                grid, (b, t_tok, h_tok, w_tok, grid.shape[-1]),
                method="nearest",
            )
            feats = grid.reshape(b, n_tok, -1)
        if cfg.MASK.DECODER_DEPTH > 0:
            # Decoder stack (`masked.py:78-120`): project to the decoder
            # width, add a learned decoder pos embed, run plain transformer
            # blocks over the full token grid (mask tokens already carry the
            # masked positions — SimMIM-style dense decoding; the token grid
            # is static, no gather/scatter).
            from pmv_tpu.models.attention import MultiScaleBlock

            dec_dim = cfg.MASK.DECODER_EMBED_DIM
            feats = nn.Dense(
                dec_dim, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="decoder_embed",
            )(feats)
            if cfg.MASK.DECODER_SEP_POS_EMBED:
                # Factorized decoder pos embed: spatial + temporal tables
                # (`masked.py` DECODER_SEP_POS_EMBED).
                pos_s = self.param(
                    "decoder_pos_embed_spatial", trunc_normal_init(0.02),
                    (1, h_tok * w_tok, dec_dim),
                )
                pos_t = self.param(
                    "decoder_pos_embed_temporal", trunc_normal_init(0.02),
                    (1, t_tok, dec_dim),
                )
                dec_pos = (
                    jnp.tile(pos_s, (1, t_tok, 1))
                    + jnp.repeat(pos_t, h_tok * w_tok, axis=1)
                )
            else:
                dec_pos = self.param(
                    "decoder_pos_embed", trunc_normal_init(0.02),
                    (1, n_tok, dec_dim),
                )
            feats = feats + dec_pos.astype(feats.dtype)
            thw_dec = (t_tok, h_tok, w_tok)
            for i in range(cfg.MASK.DECODER_DEPTH):
                feats, thw_dec = MultiScaleBlock(
                    dim=dec_dim, dim_out=dec_dim,
                    num_heads=cfg.MASK.DEC_NUM_HEADS,
                    input_size=thw_dec, has_cls_embed=False,
                    kernel_kv=cfg.MASK.DEC_KV_KERNEL,
                    stride_kv=cfg.MASK.DEC_KV_STRIDE,
                    dtype=self.dtype, name=f"decoder_blocks.{i}",
                )(feats, thw_dec, not train)
        pred = MSSeparateHead(
            out_dim=target.shape[-1], dtype=self.dtype, name="pred_head"
        )(feats)
        return pred, target, mask


def patchify_pixels(cfg, frames):
    """[B, T, H, W, C] -> ([B, n_tok, D] pixel patches, geometry).
    Mirrors the target construction (`masked.py:219-243`)."""
    patch_t, patch_h, patch_w = cfg.MVIT.PATCH_STRIDE
    frames_t = (
        frames[:, ::patch_t] if cfg.MASK.TIME_STRIDE_LOSS else frames
    )
    b, tt, hh, ww, c = frames_t.shape
    h_tok, w_tok = hh // patch_h, ww // patch_w
    pt = 1 if cfg.MASK.TIME_STRIDE_LOSS else patch_t
    t_tok = tt // pt
    patches = frames_t[:, :, : h_tok * patch_h, : w_tok * patch_w]
    patches = patches.reshape(
        b, t_tok, pt, h_tok, patch_h, w_tok, patch_w, c
    )
    patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, t_tok * h_tok * w_tok, -1
    )
    geom = (t_tok, h_tok, w_tok, pt, patch_h, patch_w, c)
    return patches, geom


def unpatchify_pixels(patches, geom):
    """Inverse of patchify_pixels: [B, n_tok, D] -> [B, T', H', W', C]."""
    t_tok, h_tok, w_tok, pt, ph, pw, c = geom
    b = patches.shape[0]
    x = patches.reshape(b, t_tok, h_tok, w_tok, pt, ph, pw, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t_tok * pt, h_tok * ph, w_tok * pw, c)


def mae_visualize(cfg, frames, pred, mask):
    """(original | masked | reconstructed) comparison for VIS_MASK.ENABLE
    (`masked.py:505-535` _mae_visualize). frames: [B, T, H, W, C] float in
    [0, 255]; pred: [B, n_tok, D] pixel predictions; mask: [B, n_tok]
    (True = masked). Returns [B, 3, T', H', W', C] uint8."""
    patches, geom = patchify_pixels(cfg, frames.astype(jnp.float32))
    m = mask.reshape(mask.shape[0], -1, 1).astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if cfg.MASK.NORM_PRED_PIXEL:
        # Predictions are per-patch normalized; re-expand with the visible
        # patch statistics for an approximate reconstruction.
        mean = patches.mean(axis=-1, keepdims=True)
        std = jnp.sqrt(patches.var(axis=-1, keepdims=True) + 1e-6)
        pred = pred * std + mean
    recon = unpatchify_pixels(pred * m + patches * (1 - m), geom)
    masked = unpatchify_pixels(patches * (1 - m), geom)
    orig = unpatchify_pixels(patches, geom)
    comp = jnp.stack([orig, masked, recon], axis=1)
    return jnp.clip(comp, 0, 255).astype(jnp.uint8)


def masked_loss(pred, target, mask):
    """MSE on masked tokens only (`masked.py` loss)."""
    err = ((pred.astype(jnp.float32) - target) ** 2).mean(axis=-1)
    denom = jnp.maximum(mask.sum(), 1)
    return (err * mask).sum() / denom


@MODEL_REGISTRY.register(name="MaskMViT")
def build_mask_mvit(cfg, hw_switch=False, dtype=jnp.float32):
    return MaskMViT(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
