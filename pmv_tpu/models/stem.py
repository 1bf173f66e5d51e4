"""Model stems (`MViT/slowfast/models/stem_helper.py`), channels-last."""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.common import trunc_normal_init


def _fold_applies(kernel, stride, padding):
    """Spatial fold needs each output window to span <=2 folded cells per
    spatial axis: kernel <= stride + padding and padding <= stride."""
    return all(
        k <= s + p and p <= s
        for k, s, p in zip(kernel[1:], stride[1:], padding[1:])
    ) and stride[1] > 1 and stride[2] > 1


def _fold_patch_conv(x, w, b, kernel, stride, padding, dtype):
    """Patch-embed conv with the spatial stride blocks folded into input
    channels: [B,T,H,W,3] -> [B,T,H/sh,W/sw,sh*sw*3], kernel re-embedded
    to [kt, ch, cw, sh*sw*3, D] (zeros at never-read taps).

    XLA's TPU lowering of a 3-input-channel conv relayouts the input into
    a C-minor form that pads 3 channels to a full sublane tile — measured
    2.5 ms fwd + 1.5 ms wgrad + 1.25 ms input copy on v5e
    (tools/profile_step.py), ~4% MXU efficiency. With 48 folded channels
    the conv is a well-tiled dense contraction. Exact same math and the
    SAME param tree: the fold of the weights happens at trace time, and
    autodiff through the embedding routes gradients back to the original
    [kt,kh,kw,3,D] parameter. Reference semantics:
    `MViT/slowfast/models/stem_helper.py` PatchEmbed.
    """
    bsz, t, h, wd, c = x.shape
    (kt, kh, kw), (st, sh, sw), (pt, ph, pw) = kernel, stride, padding
    dim_out = w.shape[-1]
    # Fold spatial stride blocks into channels (temporal axis unfolded).
    assert h % sh == 0 and wd % sw == 0, (x.shape, stride)
    hf, wf = h // sh, wd // sw
    xf = x.reshape(bsz, t, hf, sh, wf, sw, c)
    xf = xf.transpose(0, 1, 2, 4, 3, 5, 6).reshape(bsz, t, hf, wf, sh * sw * c)
    # Cells each window touches per axis: {0} if kernel <= stride (after
    # left-padding `pad` rows inside cell -1), else {-1, 0} -> 2 cells.
    ch_n = 1 if kh + ph <= sh else 2
    cw_n = 1 if kw + pw <= sw else 2
    # Embed the weights: original tap (kh') sits at folded cell
    # (kh' - ph + sh) // sh - (1 if 2 cells else 0) ... compute directly:
    # input row = sh*oh + kh' - ph; cell = row//sh - oh + (ch_n - 1),
    # pos = row % sh (row >= -ph > -sh, so add sh before the mod/div).
    wz = jnp.zeros((kt, ch_n, sh, cw_n, sw, c, dim_out), w.dtype)
    for khi in range(kh):
        row = khi - ph + sh  # shifted positive
        cell_h, pos_h = row // sh - 1 + (ch_n - 1), row % sh
        for kwi in range(kw):
            col = kwi - pw + sw
            cell_w, pos_w = col // sw - 1 + (cw_n - 1), col % sw
            wz = wz.at[:, cell_h, pos_h, cell_w, pos_w].set(w[:, khi, kwi])
    wz = wz.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
        kt, ch_n, cw_n, sh * sw * c, dim_out
    )
    y = jax.lax.conv_general_dilated(
        xf.astype(dtype), wz.astype(dtype),
        window_strides=(st, 1, 1),
        padding=((pt, pt), (ch_n - 1, 0), (cw_n - 1, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + b.astype(dtype)


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


class ResNetBasicStem(nn.Module):
    """Conv + BN + ReLU + maxpool stem (`stem_helper.py` ResNetBasicStem)."""

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        pad = [(p, p) for p in self.padding]
        x = nn.Conv(
            self.dim_out, tuple(self.kernel), tuple(self.stride), padding=pad,
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
    temporal conv (`stem_helper.py` X3DStem)."""

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(
            self.dim_out,
            (1, self.kernel[1], self.kernel[2]),
            (1, self.stride[1], self.stride[2]),
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
