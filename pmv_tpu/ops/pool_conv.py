"""Depthwise pooling conv with hand-rolled gradients (MViT pools).

XLA's grouped-conv *backward* (batch_group_count lowering) costs ~35 ms of
the MViTv2-S 16x4 train step on v5e — 22% of the step — while the forward
runs fine. This op keeps XLA's forward and replaces the gradient:

- dx: the transpose of a stride-1 SAME depthwise conv is the same conv with
  a flipped kernel, i.e. another *forward-form* grouped conv (~as cheap as
  the fwd). Strided pools use the standard lhs-dilated form on the tiny
  cotangent.
- dw: a per-channel correlation Σ_pos x_shifted ⊙ g — diagonal in C, so the
  MXU can't help and XLA's reduce lowering makes 27 full passes over x.
  A Pallas kernel does it in ONE pass, accumulating the [27, C] result in
  VMEM across a sequential (B, T) grid (stride-1 3x3x3 case); other shapes
  fall back to XLA shifted reduces on strided slices (cheap: tiny outputs).

Reference behavior: `MViT/slowfast/models/attention.py:13-49`
(attention_pool's depthwise conv), reimplemented TPU-first.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET_OVERRIDE = None  # tests force interpret-mode execution off-TPU


def _interpret():
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


def _round_up(x, m):
    return (x + m - 1) // m * m


def _conv(x, w, stride, padding, lhs_dilation=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=w.shape[-1],
    )


def _flip(w):
    return w[::-1, ::-1, ::-1]


# ------------------------------------------------------------------ dw kernel
def _dw_grad_kernel(xp_ref, g_ref, dw_ref, win_ref, sem, *, h, w, c):
    """Grid (B, T): dw[27, C] accumulated across all steps (output block
    pinned to (0, 0)). xp: padded input in ANY memory [B, T+2, H+2, Wp, Cp]
    (minor dims tile-aligned for the manual slice); g block [1,1,H,W,C]."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(t, 3)], win_ref, sem
    )
    copy.start()
    copy.wait()

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    g = g_ref[0, 0].astype(jnp.float32)  # [H, W, C]
    for dt in range(3):
        for dh in range(3):
            for dwi in range(3):
                patch = win_ref[dt, dh : dh + h, dwi : dwi + w, :c]
                s = jnp.sum(patch.astype(jnp.float32) * g, axis=(0, 1))
                dw_ref[dt * 9 + dh * 3 + dwi, :] += s


def _dw_grad_pallas(x, g):
    """dw [3,3,3,C] for a stride-1 SAME 3x3x3 depthwise conv, one pass."""
    b, t, h, w, c = x.shape
    wp = _round_up(w + 2, 8)
    cp = _round_up(c, 128)
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (1, wp - w - 1), (0, cp - c))
    )
    dw = pl.pallas_call(
        functools.partial(_dw_grad_kernel, h=h, w=w, c=c),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, h, w, c), lambda b_, t_: (b_, t_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, c), lambda b_, t_: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, h + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(xp, g)
    return dw[:27].reshape(3, 3, 3, c)


def _dw_grad_xla(x, g, kernel, stride, padding):
    """Generic dw via shifted strided reduces (cheap when g is small)."""
    kt, kh, kw = kernel
    st, sh, sw = stride
    gt, gh, gw = g.shape[1:4]
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0),) + tuple((lo, hi) for lo, hi in padding) + ((0, 0),),
    )
    g32 = g.astype(jnp.float32)
    taps = []
    for dt in range(kt):
        for dh in range(kh):
            for dwi in range(kw):
                patch = xp[
                    :,
                    dt : dt + (gt - 1) * st + 1 : st,
                    dh : dh + (gh - 1) * sh + 1 : sh,
                    dwi : dwi + (gw - 1) * sw + 1 : sw,
                    :,
                ]
                taps.append(jnp.sum(patch * g32, axis=(0, 1, 2, 3)))
    return jnp.stack(taps).reshape(kt, kh, kw, -1)


def _dx_grad(x_shape, w, g, stride, padding):
    """dx via forward-form (stride 1) or lhs-dilated conv (strided)."""
    k = w.shape[:3]
    if all(s == 1 for s in stride):
        # stride-1 SAME: self-transpose up to kernel flip -> forward conv.
        pad = [(kd - 1 - lo, kd - 1 - hi) for kd, (lo, hi) in zip(k, padding)]
        return _conv(g, _flip(w), (1, 1, 1), pad)
    # Strided: dilate the (small) cotangent by the stride.
    pad = []
    for d, (kd, s, (lo, hi)) in enumerate(zip(k, stride, padding)):
        in_d = x_shape[1 + d]
        out_d = g.shape[1 + d]
        # remainder rows of x never touched by the forward window
        rem = in_d + lo + hi - ((out_d - 1) * s + kd)
        pad.append((kd - 1 - lo, kd - 1 - hi + rem))
    return _conv(g, _flip(w), (1, 1, 1), pad, lhs_dilation=stride)


@functools.lru_cache(maxsize=None)
def _make_pool_conv(stride, padding):
    @jax.custom_vjp
    def pc(x, w):
        return _conv(x, w, stride, padding)

    def fwd(x, w):
        return pc(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        kernel = w.shape[:3]
        c = w.shape[-1]
        dx = _dx_grad(x.shape, w, g, stride, padding).astype(x.dtype)
        use_pallas = (
            kernel == (3, 3, 3)
            and stride == (1, 1, 1)
            and jax.default_backend() == "tpu"
        )
        if use_pallas:
            dw = _dw_grad_pallas(x, g)
        else:
            dw = _dw_grad_xla(x, g, kernel, stride, padding)
        return dx, dw.reshape(w.shape).astype(w.dtype)

    pc.defvjp(fwd, bwd)
    return pc


def pool_conv(x, w, stride, padding):
    """Depthwise NDHWC conv ([kt,kh,kw,1,C] kernel) with custom gradients."""
    pc = _make_pool_conv(tuple(stride), tuple(tuple(p) for p in padding))
    return pc(x, w)


def dw_window(x, w, stride, padding, accum_dtype=jnp.float32):
    """Depthwise conv for DISJOINT spatial windows (stride >= kernel on H/W,
    temporal kernel 3 stride 1 — the MViT KV pools at stride (1,4,4)/(1,8,8)).

    One pad + per-temporal-tap reshape-slice gathers every spatial window
    contiguously ([B,T,oh,kh,ow,kw,C]); the weighted tap-sum is a plain
    VPU reduce. No grouped-conv lowering, ~4 passes over the (decimated)
    data total.
    """
    b, t, h, wd, c = x.shape
    kt, kh, kw = w.shape[:3]
    st, sh, sw = stride
    assert st == 1 and sh >= kh and sw >= kw, (stride, w.shape)
    (pt0, pt1), (ph0, _), (pw0, _) = padding
    oh = (h + sum(padding[1]) - kh) // sh + 1
    ow = (wd + sum(padding[2]) - kw) // sw + 1
    # Pad so window i starts at i*s in the padded array and the reshape
    # grid [oh, sh] covers every window fully.
    hp = oh * sh + kh  # >= ph0 + h guaranteed by the output formula
    wp = ow * sw + kw
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pt0, pt1),
            (ph0, hp - h - ph0),
            (pw0, wp - wd - pw0),
            (0, 0),
        ),
    )
    wf = w.reshape(kt, kh, kw, -1).astype(accum_dtype)
    acc = jnp.zeros((b, t, oh, ow, c), accum_dtype)
    for dt in range(kt):
        sl = xp[:, dt : dt + t, : oh * sh, : ow * sw]
        win = sl.reshape(b, t, oh, sh, ow, sw, c)[:, :, :, :kh, :, :kw]
        acc = acc + jnp.einsum(
            "btoyxzc,yzc->btoxc", win.astype(accum_dtype), wf[dt]
        )
    return acc.astype(x.dtype)


def dw_shifted(x, w, stride, padding, accum_dtype=jnp.float32):
    """Depthwise conv as k^3 shifted multiply-accumulates on lane-padded
    channels.

    No grouped-conv lowering anywhere: the forward is pad/slice/mul/add
    (VPU-only, channels padded to 128 lanes so every op runs on full
    registers), and autodiff produces the same op classes — sidestepping
    both XLA's slow batch_group_count backward and its pad/slice grouped-
    conv-gradient miscompile (see AttentionPool notes).

    x: [B, T, H, W, C]; w: [kt, kh, kw, C] or [kt, kh, kw, 1, C].
    """
    b, t, h, wd, c = x.shape
    kt, kh, kw = w.shape[:3]
    st, sh, sw = stride
    cp = _round_up(c, 128)
    xp = jnp.pad(
        x, ((0, 0),) + tuple(tuple(p) for p in padding) + ((0, cp - c),)
    )
    wf = jnp.pad(w.reshape(kt, kh, kw, -1), ((0, 0),) * 3 + ((0, cp - c),))
    ot = (t + sum(padding[0]) - kt) // st + 1
    oh = (h + sum(padding[1]) - kh) // sh + 1
    ow = (wd + sum(padding[2]) - kw) // sw + 1
    acc = jnp.zeros((b, ot, oh, ow, cp), accum_dtype)
    for dt in range(kt):
        for dh in range(kh):
            for dwi in range(kw):
                sl = jax.lax.slice(
                    xp,
                    (0, dt, dh, dwi, 0),
                    (
                        b,
                        dt + (ot - 1) * st + 1,
                        dh + (oh - 1) * sh + 1,
                        dwi + (ow - 1) * sw + 1,
                        cp,
                    ),
                    (1, st, sh, sw, 1),
                )
                acc = acc + sl.astype(accum_dtype) * wf[dt, dh, dwi].astype(
                    accum_dtype
                )
    return acc[..., :c].astype(x.dtype)
