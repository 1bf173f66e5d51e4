"""AVSlowFast: audio-visual SlowFast
(`MViT/slowfast/models/video_model_builder.py:127-1088`, audio stems/stages in
`stem_helper_av.py` / `resnet_helper_av.py`).

TPU-first structure:
- visual: the two-pathway SlowFast trunk (shared building blocks);
- audio: a 2-D ResNet over the log-mel spectrogram [T_spec, n_mels]
  (channels-last, 1 input channel);
- FuseAV junction after each stage (`video_model_builder.py:208-458`):
  F->S time-strided-conv concat fusion (FS_FUSION flags) and A->FS additive
  fusion (AFS_FUSION flags) through an AU_FUSION_CONV_NUM conv stack over
  the audio time axis, projected to the post-concat slow width;
- DropPathway (`:894`): one Bernoulli(DROPPATHWAY_RATE) draw per step zeroes
  the audio->visual contribution. The reference branches in Python; here the
  gate is a traced 0/1 scalar multiplying the fused audio (the reference
  itself uses `afs * 0.0 + fuse` for the dropped branch), so the jitted
  graph is static.
- AVS (`:127-207,977-996`): per-junction sync loss — mean-pooled fs/audio
  embeddings, linear projections, L2-normalize * 0.5, contrastive loss with
  margin 0.99 over aligned/misaligned audio, masked by the variance /
  near-duplicate audio filter (`:944-965`). Losses for junctions after the
  earliest *active* A->FS fusion are zeroed (`:916-928` avs_pattern).

Misaligned audio rides as a 4th input ([slow, fast, audio, audio_mis]) with
static shapes instead of the reference's 2N-batch trick (`:935-941`).
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


def _l2_half(x):
    return 0.5 * x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


class AVSLoss(nn.Module):
    """Shared-projection AVS loss (ref_fc for visual, query_fc for audio)."""

    proj_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref, pos, neg, audio_mask, margin=0.99):
        ref_fc = nn.Dense(self.proj_dim, dtype=self.dtype, name="ref_fc")
        query_fc = nn.Dense(self.proj_dim, dtype=self.dtype, name="query_fc")
        ref = _l2_half(ref_fc(ref).astype(jnp.float32))
        pos = _l2_half(query_fc(pos).astype(jnp.float32))
        neg = _l2_half(query_fc(neg).astype(jnp.float32))
        mask = audio_mask.astype(jnp.float32)
        n = jnp.sum(mask)
        pos_loss = jnp.sum(
            mask * jnp.sum((ref - pos) ** 2, axis=-1)
        )
        neg_dist = jnp.sqrt(jnp.sum((ref - neg) ** 2, axis=-1) + 1e-12)
        neg_loss = jnp.sum(mask * jnp.maximum(margin - neg_dist, 0.0) ** 2)
        return (pos_loss + neg_loss) / (2.0 * n + 1e-8)


class FuseAV(nn.Module):
    """Per-stage junction: F->S concat + gated A->FS additive fusion
    (`video_model_builder.py:208-458`)."""

    dim_in_s: int
    dim_in_f: int
    fusion_conv_channel_ratio_f: int
    fusion_kernel_f: int
    alpha_f: int
    dim_in_a: int
    afs_interm_dim: int
    fusion_kernel_a: int
    conv_num_a: int
    use_fs_fusion: bool
    use_afs_fusion: bool
    use_avs: bool
    avs_proj_dim: int
    norm: Any = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s, x_f, x_a_pos, x_a_neg, afs_gate, avs_gate,
                 audio_mask, train=True):
        """Returns (fused_slow, avs_loss or None).

        afs_gate / avs_gate: traced 0/1 scalars (DropPathway / avs_pattern).
        x_a_*: audio features [B, T_a, M, C_a]; x_a_neg may be None.
        """
        fuse = x_s
        if self.use_fs_fusion:
            fs = nn.Conv(
                self.dim_in_f * self.fusion_conv_channel_ratio_f,
                (self.fusion_kernel_f, 1, 1),
                (self.alpha_f, 1, 1),
                padding=[(self.fusion_kernel_f // 2, self.fusion_kernel_f // 2),
                         (0, 0), (0, 0)],
                use_bias=False, dtype=self.dtype, name="conv_f2s",
            )(x_f)
            fs = self.norm(name="bn_f2s")(fs, use_running_average=not train)
            fs = nn.relu(fs)
            fuse = jnp.concatenate([fuse, fs], axis=-1)

        avs_loss = None
        # The audio projection stack exists when the junction either fuses
        # audio into the visual pathway or computes the AVS loss (the s3/s5
        # pattern: sync loss on *unfused* features).
        if self.use_afs_fusion or self.use_avs:
            dim_out_full = self.dim_in_s + (
                self.dim_in_f * self.fusion_conv_channel_ratio_f
                if self.use_fs_fusion else 0
            )

            # Shared conv stack over the audio time axis (`:378-390`),
            # defined once, applied to the aligned and misaligned clips.
            convs, bns = [], []
            for idx in range(self.conv_num_a):
                last = idx == self.conv_num_a - 1
                convs.append(
                    nn.Conv(
                        dim_out_full if last else self.afs_interm_dim,
                        (self.fusion_kernel_a, 1),
                        ((2 if last else 1), 1),
                        padding=[
                            (self.fusion_kernel_a // 2,
                             self.fusion_kernel_a // 2),
                            (0, 0),
                        ],
                        use_bias=False, dtype=self.dtype,
                        name=f"conv_a2fs_{idx}",
                    )
                )
                bns.append(self.norm(name=f"bn_a2fs_{idx}"))

            def a2fs(a):
                # [B, T_a, M, C] -> mel-mean [B, T_a, 1, C] -> conv stack.
                a = a.mean(axis=2, keepdims=True)
                for conv, bn in zip(convs, bns):
                    a = conv(a)
                    a = bn(a, use_running_average=not train)
                    a = nn.relu(a)
                return a[:, :, 0, :]  # [B, T_a', C_out]

            a_pos = a2fs(x_a_pos)
            a_neg = a2fs(x_a_neg) if x_a_neg is not None else None

            if self.use_afs_fusion:
                # Align audio time to the slow pathway, broadcast over space.
                t_s = fuse.shape[1]
                a_pos_t = jax.image.resize(
                    a_pos, (a_pos.shape[0], t_s, a_pos.shape[2]),
                    method="linear",
                ).astype(fuse.dtype)
                fuse = fuse + afs_gate * a_pos_t[:, :, None, None, :]

            if self.use_avs and a_neg is not None:
                avs_loss = AVSLoss(
                    proj_dim=self.avs_proj_dim, dtype=self.dtype, name="avs",
                )(
                    fuse.mean(axis=(1, 2, 3)).astype(jnp.float32),
                    a_pos.mean(axis=1).astype(jnp.float32),
                    a_neg.mean(axis=1).astype(jnp.float32),
                    audio_mask,
                ) * avs_gate
        return fuse, avs_loss


def audio_pair_mask(a_pos, a_neg, var_thresh, dup_thresh):
    """Valid-pair mask: drop near-silent and near-duplicate audio pairs
    (`video_model_builder.py:944-965` filter_duplicates)."""
    p = jax.lax.stop_gradient(a_pos.reshape(a_pos.shape[0], -1))
    n = jax.lax.stop_gradient(a_neg.reshape(a_neg.shape[0], -1))
    var_ok = (jnp.var(p, axis=1) > var_thresh) & (
        jnp.var(n, axis=1) > var_thresh
    )
    pn = p / (jnp.linalg.norm(p, axis=1, keepdims=True) + 1e-12)
    nn_ = n / (jnp.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
    sim = jnp.sum(pn * nn_, axis=1)
    return var_ok & (sim < dup_thresh)


class AVSlowFast(nn.Module):
    """Audio-visual SlowFast; input [slow, fast, audio(, audio_mis)]."""

    cfg: Any
    hw_switch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True, return_embeddings=False):
        cfg = self.cfg
        assert isinstance(x, (list, tuple)) and len(x) in (3, 4), (
            "AVSlowFast expects [slow, fast, audio(, audio_mis)] inputs"
        )
        x_s, x_f, x_a = x[0], x[1], x[2]
        x_a_neg = x[3] if len(x) == 4 else None
        if x_a.ndim == 3:
            x_a = x_a[..., None]  # [B, T_spec, M, 1]
        if x_a_neg is not None and x_a_neg.ndim == 3:
            x_a_neg = x_a_neg[..., None]
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
        fs_fusion = list(cfg.SLOWFAST.FS_FUSION)
        afs_fusion = list(cfg.SLOWFAST.AFS_FUSION)
        avs_flag = list(cfg.SLOWFAST.AVS_FLAG)
        misaligned = x_a_neg is not None

        if cfg.SLOWFAST.AU_FUSION_CONV_CHANNEL_MODE == "ByDim":
            def interm_dim(dim_a):
                return max(1, int(cfg.SLOWFAST.AU_FUSION_CONV_CHANNEL_DIM))
        else:
            def interm_dim(dim_a):
                return max(
                    1, int(dim_a * cfg.SLOWFAST.AU_FUSION_CONV_CHANNEL_RATIO)
                )

        # ---- DropPathway (`:894`): one draw per step, traced 0/1 gate.
        if train and cfg.SLOWFAST.DROPPATHWAY_RATE > 0:
            is_drop = (
                jax.random.uniform(self.make_rng("dropout"))
                < cfg.SLOWFAST.DROPPATHWAY_RATE
            )
        else:
            is_drop = jnp.asarray(False)
        afs_gate = 1.0 - is_drop.astype(jnp.float32)

        # avs_pattern (`:916-928`): junctions after the earliest ACTIVE
        # A->FS fusion never see an AVS loss. Static earliest when not
        # dropped; no fusion at all when dropped.
        earliest_static = 4
        for i in range(3, -1, -1):
            if afs_fusion[i]:
                earliest_static = i
        avs_gates = []
        for i in range(5):
            if not avs_flag[i]:
                avs_gates.append(jnp.asarray(0.0))
            else:
                active_when_kept = 1.0 if i <= earliest_static else 0.0
                avs_gates.append(
                    jnp.where(is_drop, 1.0, active_when_kept)
                )

        audio_mask = (
            audio_pair_mask(
                x_a, x_a_neg,
                cfg.SLOWFAST.AVS_VAR_THRESH,
                cfg.SLOWFAST.AVS_DUPLICATE_THRESH,
            )
            if misaligned
            else None
        )

        # ---- stems
        x_s = ResNetBasicStem(
            dim_out=width, kernel=(tk[0][0][0], 7, 7), stride=(1, 2, 2),
            padding=(tk[0][0][0] // 2, 3, 3), dtype=self.dtype,
            use_fold=cfg.TPU.FOLD_STEM,
            name="s1.pathway0_stem",
        )(x_s, train=train)
        x_f = ResNetBasicStem(
            dim_out=width // beta, kernel=(tk[0][1][0], 7, 7),
            stride=(1, 2, 2), padding=(tk[0][1][0] // 2, 3, 3),
            dtype=self.dtype, use_fold=cfg.TPU.FOLD_STEM,
            name="s1.pathway1_stem",
        )(x_f, train=train)
        audio_stem = AudioStem(
            dim_out=width // beta, norm=norm, dtype=self.dtype,
            name="s1.pathway2_stem",
        )
        x_a = audio_stem(x_a, train=train)
        if misaligned:
            x_a_neg = audio_stem(x_a_neg, train=train)

        aux_losses = {}

        def junction(idx, x_s, x_f, x_a, x_a_neg, dim_s, dim_f, dim_a,
                     use_fs, use_afs, gate):
            fuse_mod = FuseAV(
                dim_in_s=dim_s, dim_in_f=dim_f,
                fusion_conv_channel_ratio_f=ratio, fusion_kernel_f=fk,
                alpha_f=alpha, dim_in_a=dim_a,
                afs_interm_dim=interm_dim(dim_a),
                fusion_kernel_a=cfg.SLOWFAST.AU_FUSION_KERNEL_SZ,
                conv_num_a=cfg.SLOWFAST.AU_FUSION_CONV_NUM,
                use_fs_fusion=use_fs,
                use_afs_fusion=use_afs,
                use_avs=avs_flag[idx] and misaligned,
                avs_proj_dim=cfg.SLOWFAST.AVS_PROJ_DIM,
                norm=norm, dtype=self.dtype, name=f"s{idx + 1}_fuse",
            )
            fused, avs_loss = fuse_mod(
                x_s, x_f, x_a, x_a_neg, gate, avs_gates[idx],
                audio_mask, train=train,
            )
            if avs_loss is not None:
                aux_losses[f"s{idx + 1}_avs"] = avs_loss
            return fused

        # ---- s1 junction
        if fs_fusion[0] or afs_fusion[0] or (avs_flag[0] and misaligned):
            x_s = junction(
                0, x_s, x_f, x_a, x_a_neg,
                width, width // beta, width // beta,
                fs_fusion[0], afs_fusion[0], afs_gate,
            )

        stage_specs = [
            (width, width * 4, dim_inner, d2, 1),
            (width * 4, width * 8, dim_inner * 2, d3, 2),
            (width * 8, width * 16, dim_inner * 4, d4, 2),
            (width * 16, width * 32, dim_inner * 8, d5, 2),
        ]
        for si, (din, dout, dinner, nblk, stride) in enumerate(stage_specs):
            concat_in = din + (
                din // beta * ratio if fs_fusion[si] else 0
            )
            x_s = ResStage(
                dim_in=concat_in, dim_out=dout,
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
            audio_stage = AudioStage(
                dim_out=dout // beta, dim_inner=dinner // beta,
                num_blocks=nblk, stride=stride, norm=norm, dtype=self.dtype,
                name=f"s{si + 2}.pathway2",
            )
            x_a = audio_stage(x_a, train=train)
            if misaligned:
                x_a_neg = audio_stage(x_a_neg, train=train)
            jidx = si + 1
            if jidx < 4 and (
                fs_fusion[jidx] or afs_fusion[jidx]
                or (avs_flag[jidx] and misaligned)
            ):
                x_s = junction(
                    jidx, x_s, x_f, x_a, x_a_neg,
                    dout, dout // beta, dout // beta,
                    fs_fusion[jidx], afs_fusion[jidx], afs_gate,
                )
            elif jidx == 4 and avs_flag[4] and misaligned:
                # s5 junction is AVS-only: the reference calls it with
                # mode='FS' and DISCARDS the fused output (`:1053-1066`) —
                # only the sync loss on the cached features survives.
                junction(
                    4, x_s, x_f, x_a, x_a_neg,
                    dout, dout // beta, dout // beta,
                    True, True, jnp.asarray(0.0),
                )

        if return_embeddings:
            v_emb = jnp.concatenate(
                [x_s.mean(axis=(1, 2, 3)), x_f.mean(axis=(1, 2, 3))], axis=-1
            )
            a_emb = x_a.mean(axis=(1, 2))
            return v_emb, a_emb

        # Audio joins the head as a third pooled pathway (aligned only).
        x_a5 = x_a.mean(axis=2)[:, :, None, None, :]  # [B, T, 1, 1, C]
        out = ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            dtype=self.dtype,
            name="head",
        )([x_s, x_f, x_a5], train=train)
        if train and misaligned:
            return out, aux_losses
        return out


def avs_loss(v_emb, a_emb_pos, a_emb_neg, margin=0.5):
    """Standalone triplet sync loss over pooled embeddings (utility)."""

    def cos(a, b):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
        return jnp.sum(a * b, axis=-1)

    pos = cos(v_emb, a_emb_pos)
    neg = cos(v_emb, a_emb_neg)
    return jnp.maximum(0.0, margin - pos + neg).mean()


@MODEL_REGISTRY.register(name="AVSlowFast")
def build_avslowfast(cfg, hw_switch=False, dtype=jnp.float32):
    return AVSlowFast(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
