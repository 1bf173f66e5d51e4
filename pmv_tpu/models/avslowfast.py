"""AVSlowFast: audio-visual SlowFast
(`MViT/slowfast/models/video_model_builder.py:460-1088`, audio stems/stages in
`stem_helper_av.py` / `resnet_helper_av.py`).

TPU-first structure:
- visual: the two-pathway SlowFast trunk (shared building blocks);
- audio: a 2-D ResNet over the log-mel spectrogram [T_spec, n_mels]
  (channels-last, 1 input channel);
- FuseAV: after each visual stage, pooled audio features are temporally
  resampled to the fast pathway's length, projected by a 1x1x1 conv, and
  added to the fast pathway (the reference's lateral audio->visual fusion;
  its gating variants are tracked for a later round);
- AVS: the audio-visual sync auxiliary loss (`video_model_builder.py:127-`)
  as a functional triplet loss over pooled embeddings with misaligned-audio
  negatives.
"""

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.heads import ResNetBasicHead
from pmv_tpu.models.resnet import (
    _MODEL_STAGE_DEPTH,
    _TEMPORAL_KERNEL_BASIS_SLOWFAST,
    FuseFastToSlow,
    _norm_factory,
)
from pmv_tpu.models.resnet_helper import ResStage
from pmv_tpu.models.stem import ResNetBasicStem


class AudioStem(nn.Module):
    """Spectrogram stem: separable (9x1)+(1,9) convs (`stem_helper_av.py`)."""

    dim_out: int
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        # x: [B, T_spec, M, 1]
        x = nn.Conv(
            self.dim_out, (9, 1), (2, 1), padding=[(4, 4), (0, 0)],
            use_bias=False, dtype=self.dtype, name="conv_t",
        )(x)
        x = nn.Conv(
            self.dim_out, (1, 9), (1, 2), padding=[(0, 0), (4, 4)],
            use_bias=False, dtype=self.dtype, name="conv_f",
        )(x)
        x = self.norm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class AudioStage(nn.Module):
    """2-D bottleneck stage over the spectrogram grid."""

    dim_out: int
    dim_inner: int
    num_blocks: int
    stride: int
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        for i in range(self.num_blocks):
            stride = self.stride if i == 0 else 1
            shortcut = x
            h = nn.Conv(self.dim_inner, (1, 1), (stride, stride),
                        use_bias=False, dtype=self.dtype, name=f"b{i}_a")(x)
            h = self.norm(name=f"b{i}_a_bn")(h, use_running_average=not train)
            h = nn.relu(h)
            h = nn.Conv(self.dim_inner, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"b{i}_b")(h)
            h = self.norm(name=f"b{i}_b_bn")(h, use_running_average=not train)
            h = nn.relu(h)
            h = nn.Conv(self.dim_out, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"b{i}_c")(h)
            h = self.norm(name=f"b{i}_c_bn")(h, use_running_average=not train)
            if shortcut.shape[-1] != self.dim_out or stride != 1:
                shortcut = nn.Conv(
                    self.dim_out, (1, 1), (stride, stride), use_bias=False,
                    dtype=self.dtype, name=f"b{i}_proj",
                )(shortcut)
                shortcut = self.norm(name=f"b{i}_proj_bn")(
                    shortcut, use_running_average=not train
                )
            x = nn.relu(shortcut + h)
        return x


class FuseAV(nn.Module):
    """Audio -> fast-pathway lateral fusion."""

    dim_fast: int
    norm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_fast, x_audio, train=True):
        # Pool the mel axis, resample time to the fast pathway's length.
        a = x_audio.mean(axis=2)  # [B, T_spec', C_a]
        t_fast = x_fast.shape[1]
        a = jax.image.resize(
            a, (a.shape[0], t_fast, a.shape[2]), method="linear"
        )
        a = nn.Dense(self.dim_fast, use_bias=False, dtype=self.dtype,
                     name="proj")(a)
        a = self.norm(name="bn")(a, use_running_average=not train)
        a = nn.relu(a)
        # Broadcast over the spatial grid and add.
        return x_fast + a[:, :, None, None, :]


class AVSlowFast(nn.Module):
    """Audio-visual SlowFast; input [slow, fast, audio_logmel]."""

    cfg: Any
    hw_switch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True, return_embeddings=False):
        cfg = self.cfg
        assert isinstance(x, (list, tuple)) and len(x) == 3, (
            "AVSlowFast expects [slow, fast, audio] inputs"
        )
        x_s, x_f, x_a = x
        if x_a.ndim == 3:
            x_a = x_a[..., None]  # [B, T_spec, M, 1]
        norm = partial(_norm_factory(cfg), dtype=self.dtype)
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        width = cfg.RESNET.WIDTH_PER_GROUP
        num_groups = cfg.RESNET.NUM_GROUPS
        dim_inner = num_groups * width
        beta = cfg.SLOWFAST.BETA_INV
        ratio = cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO
        alpha = cfg.SLOWFAST.ALPHA
        fk = cfg.SLOWFAST.FUSION_KERNEL_SZ
        tk = _TEMPORAL_KERNEL_BASIS_SLOWFAST

        x_s = ResNetBasicStem(
            dim_out=width, kernel=(tk[0][0][0], 7, 7), stride=(1, 2, 2),
            padding=(tk[0][0][0] // 2, 3, 3), dtype=self.dtype,
            name="s1.pathway0_stem",
        )(x_s, train=train)
        x_f = ResNetBasicStem(
            dim_out=width // beta, kernel=(tk[0][1][0], 7, 7),
            stride=(1, 2, 2), padding=(tk[0][1][0] // 2, 3, 3),
            dtype=self.dtype, name="s1.pathway1_stem",
        )(x_f, train=train)
        x_a = AudioStem(
            dim_out=width // beta, norm=norm, dtype=self.dtype,
            name="s1.pathway2_stem",
        )(x_a, train=train)
        x_s, x_f = FuseFastToSlow(
            dim_in=width // beta, fusion_conv_channel_ratio=ratio,
            fusion_kernel=fk, alpha=alpha, norm=norm, dtype=self.dtype,
            name="s1_fuse",
        )(x_s, x_f, train=train)

        stage_specs = [
            (width, width * 4, dim_inner, d2, 1),
            (width * 4, width * 8, dim_inner * 2, d3, 2),
            (width * 8, width * 16, dim_inner * 4, d4, 2),
            (width * 16, width * 32, dim_inner * 8, d5, 2),
        ]
        for si, (din, dout, dinner, nblk, stride) in enumerate(stage_specs):
            x_s = ResStage(
                dim_in=din + din // beta * ratio, dim_out=dout,
                dim_inner=dinner, temp_kernel_sizes=tuple(tk[si + 1][0]),
                stride=stride, num_blocks=nblk, num_groups=num_groups,
                num_block_temp_kernel=nblk, norm=norm, dtype=self.dtype,
                name=f"s{si + 2}.pathway0",
            )(x_s, train=train)
            x_f = ResStage(
                dim_in=din // beta, dim_out=dout // beta,
                dim_inner=dinner // beta,
                temp_kernel_sizes=tuple(tk[si + 1][1]),
                stride=stride, num_blocks=nblk, num_groups=num_groups,
                num_block_temp_kernel=nblk, norm=norm, dtype=self.dtype,
                name=f"s{si + 2}.pathway1",
            )(x_f, train=train)
            x_a = AudioStage(
                dim_out=dout // beta, dim_inner=dinner // beta,
                num_blocks=nblk, stride=stride, norm=norm, dtype=self.dtype,
                name=f"s{si + 2}.pathway2",
            )(x_a, train=train)
            x_f = FuseAV(
                dim_fast=dout // beta, norm=norm, dtype=self.dtype,
                name=f"s{si + 2}_afuse",
            )(x_f, x_a, train=train)
            if si < 3:
                x_s, x_f = FuseFastToSlow(
                    dim_in=dout // beta, fusion_conv_channel_ratio=ratio,
                    fusion_kernel=fk, alpha=alpha, norm=norm,
                    dtype=self.dtype, name=f"s{si + 2}_fuse",
                )(x_s, x_f, train=train)

        if return_embeddings:
            v_emb = jnp.concatenate(
                [x_s.mean(axis=(1, 2, 3)), x_f.mean(axis=(1, 2, 3))], axis=-1
            )
            a_emb = x_a.mean(axis=(1, 2))
            return v_emb, a_emb

        # Audio joins the head as a third pooled pathway.
        x_a5 = x_a.mean(axis=2)[:, :, None, None, :]  # [B, T, 1, 1, C]
        out = ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            dtype=self.dtype,
            name="head",
        )([x_s, x_f, x_a5], train=train)
        return out


def avs_loss(v_emb, a_emb_pos, a_emb_neg, margin=0.5):
    """Audio-visual sync triplet loss (`video_model_builder.py` AVS):
    aligned audio should be closer to the visual embedding than misaligned."""

    def cos(a, b):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
        return jnp.sum(a * b, axis=-1)

    d = v_emb.shape[-1]
    a_pos = a_emb_pos
    a_neg = a_emb_neg
    if a_pos.shape[-1] != d:
        # Project by truncation/pad to compare (caller should project).
        raise ValueError("embedding dims must match; project before avs_loss")
    pos = cos(v_emb, a_pos)
    neg = cos(v_emb, a_neg)
    return jnp.maximum(0.0, margin - pos + neg).mean()


@MODEL_REGISTRY.register(name="AVSlowFast")
def build_avslowfast(cfg, hw_switch=False, dtype=jnp.float32):
    return AVSlowFast(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
