"""Model stems (`MViT/slowfast/models/stem_helper.py`), channels-last."""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.common import trunc_normal_init


def _fold_cells(k, s, p):
    """Folded cells a k-wide stride-s pad-p window touches per axis:
    [cell_lo, cell_hi] relative to the output's own cell."""
    cell_lo = -(-(p) // s)  # ceil(p/s); window starts at -p
    cell_hi = (k - 1 - p) // s
    return -cell_lo, cell_hi


def _fold_applies(kernel, stride, padding):
    """The spatial fold applies to any strided conv (the cell embedding
    generalizes to arbitrary window extents); gate on an actual spatial
    stride so unstrided convs keep the direct lowering."""
    return stride[1] > 1 and stride[2] > 1


def _fold_patch_conv(x, w, b, kernel, stride, padding, dtype):
    """Strided conv with the spatial stride blocks folded into input
    channels: [B,T,H,W,3] -> [B,T,H/sh,W/sw,sh*sw*3], kernel re-embedded
    to [kt, ch, cw, sh*sw*3, D] (zeros at never-read taps).

    XLA's TPU lowering of a 3-input-channel conv relayouts the input into
    a C-minor form that pads 3 channels to a full sublane tile — measured
    2.5 ms fwd + 1.5 ms wgrad + 1.25 ms input copy on v5e
    (tools/profile_step.py), ~4% MXU efficiency. With 48 folded channels
    the conv is a well-tiled dense contraction. Exact same math and the
    SAME param tree: the fold of the weights happens at trace time, and
    autodiff through the embedding routes gradients back to the original
    [kt,kh,kw,3,D] parameter. Windows may span any number of folded
    cells: each original tap (kh', kw') lands at exactly one
    (cell, in-cell position); the extra left/right zero cells coincide
    with the original SAME padding (taps beyond it do not exist in the
    embedded kernel). Reference semantics:
    `MViT/slowfast/models/stem_helper.py` PatchEmbed/ResNetBasicStem.
    """
    bsz, t, h, wd, c = x.shape
    (kt, kh, kw), (st, sh, sw), (pt, ph, pw) = kernel, stride, padding
    dim_out = w.shape[-1]
    # Fold spatial stride blocks into channels (temporal axis unfolded).
    assert h % sh == 0 and wd % sw == 0, (x.shape, stride)
    hf, wf = h // sh, wd // sw
    xf = x.reshape(bsz, t, hf, sh, wf, sw, c)
    xf = xf.transpose(0, 1, 2, 4, 3, 5, 6).reshape(bsz, t, hf, wf, sh * sw * c)
    lo_h, hi_h = _fold_cells(kh, sh, ph)
    lo_w, hi_w = _fold_cells(kw, sw, pw)
    ch_n, cw_n = hi_h - lo_h + 1, hi_w - lo_w + 1
    wz = jnp.zeros((kt, ch_n, sh, cw_n, sw, c, dim_out), w.dtype)
    for khi in range(kh):
        row = khi - ph
        cell_h, pos_h = row // sh - lo_h, row % sh
        for kwi in range(kw):
            col = kwi - pw
            cell_w, pos_w = col // sw - lo_w, col % sw
            wz = wz.at[:, cell_h, pos_h, cell_w, pos_w].set(w[:, khi, kwi])
    wz = wz.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
        kt, ch_n, cw_n, sh * sw * c, dim_out
    )
    y = jax.lax.conv_general_dilated(
        xf.astype(dtype), wz.astype(dtype),
        window_strides=(st, 1, 1),
        padding=((pt, pt), (-lo_h, hi_h), (-lo_w, hi_w)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + b.astype(dtype)


def _fold_out_factor(dim_out, h, wd, stride):
    """Largest f in (4, 2) such that an f x f block of output positions
    folded into channels stays within ~128 lanes and divides the grid."""
    sh, sw = stride[1], stride[2]
    for f in (4, 2):
        if (
            dim_out * f * f <= 128
            and h % (sh * f) == 0
            and wd % (sw * f) == 0
        ):
            return f
    return 1


def _fold_out_conv(x, w, kernel, stride, padding, f, dtype, unfold=True):
    """Strided conv computed with an f x f block of OUTPUT positions
    folded into channels (then unfolded): the fast-pathway SlowFast stem
    writes 8 output channels, and XLA's lowering of that conv runs at
    ~0.1 TF/s (43.4 ms fwd + 13.5 ms bwd of a 152 ms step,
    tools/profile_step.py round 5) because 8 lanes of a 128-lane vreg do
    the work. Folding 4x4 output positions makes it a 128-output-channel
    dense contraction on the same bytes. Exact same math and param tree:
    the big kernel embeds the original taps once per block position at
    trace time, and the output unfold is a reshape/transpose.
    """
    kt, kh, kw = kernel
    st, sh, sw = stride
    pt, ph, pw = padding
    c, dim_out = w.shape[-2], w.shape[-1]
    kh_b, kw_b = kh + (f - 1) * sh, kw + (f - 1) * sw
    w_big = jnp.zeros((kt, kh_b, kw_b, c, f * f * dim_out), w.dtype)
    for i in range(f):
        for j in range(f):
            blk = (i * f + j) * dim_out
            w_big = jax.lax.dynamic_update_slice(
                w_big, w, (0, i * sh, j * sw, 0, blk)
            )
    y = _fold_patch_conv(
        x, w_big, jnp.zeros((f * f * dim_out,), w.dtype),
        (kt, kh_b, kw_b), (st, sh * f, sw * f), (pt, ph, pw), dtype,
    )
    if not unfold:
        return y  # [B, T, H/(sh*f), W/(sw*f), f*f*dim_out]
    return _unfold_out(y, f, dim_out)


def _unfold_out(y, f, dim_out):
    """Invert the output-position fold: [..., f*f*D] -> spatial f x f."""
    bsz, t, hb, wb, _ = y.shape
    y = y.reshape(bsz, t, hb, wb, f, f, dim_out)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)
    return y.reshape(bsz, t, hb * f, wb * f, dim_out)


class _ProjParams(nn.Module):
    """Kernel+bias with nn.Conv's exact param names/shapes/init."""

    dim_out: int
    kernel: Sequence[int]
    c_in: int

    @nn.compact
    def __call__(self):
        w = self.param(
            "kernel", trunc_normal_init(0.02),
            tuple(self.kernel) + (self.c_in, self.dim_out),
        )
        b = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        return w, b


class PatchEmbed(nn.Module):
    """3D conv patch embed -> token sequence (`stem_helper.py` PatchEmbed).

    Input [B, T, H, W, C]; returns (tokens [B, N, D], (T', H', W')).
    """

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    conv_2d: bool = False
    use_fold: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if (
            self.use_fold
            and not self.conv_2d
            and len(self.kernel) == 3
            and _fold_applies(self.kernel, self.stride, self.padding)
            and x.shape[2] % self.stride[1] == 0
            and x.shape[3] % self.stride[2] == 0
        ):
            w, b = _ProjParams(
                self.dim_out, tuple(self.kernel), x.shape[-1], name="proj"
            )()
            x = _fold_patch_conv(
                x, w, b, tuple(self.kernel), tuple(self.stride),
                tuple(self.padding), self.dtype,
            )
            thw = (x.shape[1], x.shape[2], x.shape[3])
            return x.reshape(x.shape[0], -1, self.dim_out), thw
        if self.conv_2d:
            # Per-frame 2D conv: fold T into batch.
            b, t, h, w, c = x.shape
            x = x.reshape(b * t, h, w, c)
            pad = [(p, p) for p in self.padding[-2:]]
            x = nn.Conv(
                self.dim_out, tuple(self.kernel[-2:]), tuple(self.stride[-2:]),
                padding=pad, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="proj",
            )(x)
            x = x.reshape(b, t, x.shape[1], x.shape[2], self.dim_out)
        else:
            pad = [(p, p) for p in self.padding]
            x = nn.Conv(
                self.dim_out, tuple(self.kernel), tuple(self.stride),
                padding=pad, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="proj",
            )(x)
        thw = (x.shape[1], x.shape[2], x.shape[3])
        return x.reshape(x.shape[0], -1, self.dim_out), thw


class _FoldedStemBN(nn.Module):
    """BatchNorm applied in the output-position-FOLDED stem layout.

    The folded tensor's channels are (position, channel) pairs; batch
    statistics per REAL channel are the equal-weight combination of the
    per-pair statistics (every position group covers the same number of
    samples), so computing sums in folded form and reducing over the
    position axis is EXACTLY nn.BatchNorm's statistics. Param names,
    shapes, init, running-stats collection and momentum semantics match
    ``nn.BatchNorm(momentum, epsilon)`` (fast variance, f32 stats), so
    the param tree and checkpoints are unchanged. Motivation: BN/ReLU on
    the unfolded 8-channel fast-stem tensor leave 120 of 128 vreg lanes
    idle (~7 ms of the SlowFast step, round-5 after-profile).
    """

    dim_out: int  # real channel count D; input carries f*f*D
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, use_running_average):
        ff = y.shape[-1] // self.dim_out
        scale = self.param("scale", nn.initializers.ones, (self.dim_out,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.dim_out,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.dim_out,), jnp.float32),
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            yf = y.astype(jnp.float32)
            m_pc = jnp.mean(yf, axis=(0, 1, 2, 3))  # [f*f*D]
            m2_pc = jnp.mean(yf * yf, axis=(0, 1, 2, 3))
            mean = m_pc.reshape(ff, self.dim_out).mean(axis=0)
            var = m2_pc.reshape(ff, self.dim_out).mean(axis=0) - mean * mean
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        mul = jnp.tile(inv, ff)
        add = jnp.tile(
            bias.astype(jnp.float32) - mean * inv, ff
        )
        return (y.astype(jnp.float32) * mul + add).astype(self.dtype)


class _StemConvParams(nn.Module):
    """Bias-free conv kernel with nn.Conv's param name/shape/init."""

    dim_out: int
    kernel: Sequence[int]
    c_in: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            tuple(self.kernel) + (self.c_in, self.dim_out),
        )


class ResNetBasicStem(nn.Module):
    """Conv + BN + ReLU + maxpool stem (`stem_helper.py` ResNetBasicStem).

    With ``use_fold`` (TPU.FOLD_STEM) the strided stem conv runs with the
    input stride blocks folded into channels and — for narrow outputs
    like the SlowFast fast pathway's 8 channels — an f x f block of
    output positions folded into channels (see _fold_out_conv): measured
    43.4 ms fwd + 13.5 ms bwd for the fast stem's direct lowering on v5e
    (round-5 profile). Exact same math and param tree.
    """

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    use_fold: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        pad = [(p, p) for p in self.padding]
        if (
            self.use_fold
            and len(self.kernel) == 3
            and _fold_applies(self.kernel, self.stride, self.padding)
            and x.shape[2] % self.stride[1] == 0
            and x.shape[3] % self.stride[2] == 0
        ):
            w = _StemConvParams(
                self.dim_out, tuple(self.kernel), x.shape[-1], name="conv"
            )()
            f = _fold_out_factor(
                self.dim_out, x.shape[2], x.shape[3], self.stride
            )
            if f > 1:
                # Stay in the folded 128-wide layout through BN + ReLU
                # (statistics combine exactly across position groups);
                # unfold only for the window-crossing max pool.
                x = _fold_out_conv(
                    x, w, tuple(self.kernel), tuple(self.stride),
                    tuple(self.padding), f, self.dtype, unfold=False,
                )
                x = _FoldedStemBN(
                    dim_out=self.dim_out, momentum=self.bn_momentum,
                    epsilon=self.bn_eps, dtype=self.dtype, name="bn",
                )(x, use_running_average=not train)
                x = nn.relu(x)
                x = _unfold_out(x, f, self.dim_out)
            else:
                x = _fold_patch_conv(
                    x, w, jnp.zeros((self.dim_out,), w.dtype),
                    tuple(self.kernel), tuple(self.stride),
                    tuple(self.padding), self.dtype,
                )
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=self.bn_eps, dtype=self.dtype, name="bn",
                )(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(
                self.dim_out, tuple(self.kernel), tuple(self.stride),
                padding=pad,
                use_bias=False, dtype=self.dtype, name="conv",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=self.bn_eps, dtype=self.dtype, name="bn",
            )(x)
            x = nn.relu(x)
        # 1x3x3 max pool stride 1,2,2 (reference pool_layer).
        import jax.lax as lax

        x = lax.reduce_window(
            x, -jnp.inf, lax.max,
            (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return x


class X3DStem(nn.Module):
    """Channel-separated stem: 1xkxk spatial conv then kx1x1 depthwise
    temporal conv (`stem_helper.py` X3DStem). ``use_fold`` applies the
    input + output-position fold to the spatial conv (3 -> 24 channels
    leaves most vreg lanes idle in the direct lowering; see
    ResNetBasicStem)."""

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    use_fold: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        k_xy = (1, self.kernel[1], self.kernel[2])
        s_xy = (1, self.stride[1], self.stride[2])
        p_xy = (0, self.padding[1], self.padding[2])
        if (
            self.use_fold
            and _fold_applies(k_xy, s_xy, p_xy)
            and x.shape[2] % self.stride[1] == 0
            and x.shape[3] % self.stride[2] == 0
        ):
            w = _StemConvParams(
                self.dim_out, k_xy, x.shape[-1], name="conv_xy"
            )()
            f = _fold_out_factor(self.dim_out, x.shape[2], x.shape[3], s_xy)
            if f > 1:
                x = _fold_out_conv(x, w, k_xy, s_xy, p_xy, f, self.dtype)
            else:
                x = _fold_patch_conv(
                    x, w, jnp.zeros((self.dim_out,), w.dtype),
                    k_xy, s_xy, p_xy, self.dtype,
                )
        else:
            x = nn.Conv(
                self.dim_out,
                k_xy,
                s_xy,
                padding=[(0, 0), (self.padding[1], self.padding[1]),
                         (self.padding[2], self.padding[2])],
                use_bias=False, dtype=self.dtype, name="conv_xy",
            )(x)
        x = nn.Conv(
            self.dim_out,
            (self.kernel[0], 1, 1),
            (self.stride[0], 1, 1),
            padding=[(self.padding[0], self.padding[0]), (0, 0), (0, 0)],
            feature_group_count=self.dim_out,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)
