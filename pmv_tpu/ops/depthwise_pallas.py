"""Pallas TPU kernels: depthwise 3-D convolution (MViT pooling convs).

Motivation (measured on v5e): XLA's grouped conv runs ~1.7 ms for a
stride-1 3x3x3 depthwise conv at 96 channels on the MViTv2-S stage-1 grid,
while 128-lane-aligned channels are ~free — but zero-padding channels trips
an XLA grouped-conv-gradient miscompile (see ROADMAP.md). These kernels
compute the conv as 27 shifted multiply-accumulates on VMEM tiles, with the
channel axis padded to lanes implicitly by Mosaic tiling — no grouped-conv
lowering at all.

Scope: stride (1, 1, 1), kernel (3, 3, 3), 'SAME' padding — the hot q-pool
configuration. Strided KV pools stay on XLA (small outputs). Gated by
cfg.MVIT.USE_PALLAS_POOLS.

Layout: x [B, T, H, W, C] channels-last; weights [3, 3, 3, C] (depthwise).
The grid walks (B, T, H-tiles); each step DMAs nothing manually — the halo
is realized by padding the input outside the kernel and giving each grid
step an overlapping *input window* via three temporal block refs would need
overlap, so instead the padded input is passed whole in ANY memory and the
window is copied per step with `make_async_copy`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INTERPRET_OVERRIDE = None  # tests force interpret-mode execution off-TPU


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


def _dw_fwd_kernel(xp_ref, w_ref, o_ref, win_ref, sem, *, th, width, c):
    """Grid (B, T, H_tiles). xp_ref: padded input in ANY memory
    [B, T+2, H_pad+2, Wp, Cp]; w [27, Cp] VMEM; o [1, 1, TH, W, C] VMEM tile.

    Mosaic constraint: manual slices of a tiled HBM memref must keep the
    sublane/lane dims (last two) whole-and-aligned — hence Wp = rnd8(W+2)
    and Cp = rnd128(C) physical padding done by the caller; only B/T/H are
    sliced here.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    i = pl.program_id(2)

    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(t, 3), pl.ds(i * th, th + 2)],
        win_ref,
        sem,
    )
    copy.start()
    copy.wait()

    cp = win_ref.shape[-1]
    acc = jnp.zeros((th, width, cp), jnp.float32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                tap = w_ref[dt * 9 + dh * 3 + dw, :]
                patch = win_ref[dt, dh : dh + th, dw : dw + width, :]
                acc += patch.astype(jnp.float32) * tap.astype(jnp.float32)[None, None, :]
    o_ref[0, 0] = acc[:, :, :c].astype(o_ref.dtype)


def depthwise3x3x3_fwd(x, w, tile_h=56):
    """x [B, T, H, W, C], w [3, 3, 3, C] -> [B, T, H, W, C] (stride 1, SAME)."""
    b, t, h, wd, c = x.shape
    tile_h = min(tile_h, h)
    n_h = -(-h // tile_h)
    h_pad = n_h * tile_h
    # Tile-align the two minor dims for the manual HBM slice (see kernel).
    wp = _round_up(wd + 2, 8)
    cp = _round_up(c, 128)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (1, 1),
            (1, 1 + (h_pad - h)),
            (1, wp - wd - 1),
            (0, cp - c),
        ),
    )
    w_flat = jnp.pad(w.reshape(27, c), ((0, 0), (0, cp - c)))

    out = pl.pallas_call(
        functools.partial(_dw_fwd_kernel, th=tile_h, width=wd, c=c),
        grid=(b, t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27, cp), lambda b_, t_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_h, wd, c), lambda b_, t_, i_: (b_, t_, i_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h_pad, wd, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(xp, w_flat)
    return out[:, :, :h]


def _flip_w(w):
    return w[::-1, ::-1, ::-1]


@jax.custom_vjp
def depthwise3x3x3(x, w):
    """Differentiable stride-1 SAME depthwise conv3d via Pallas kernels."""
    return depthwise3x3x3_fwd(x, w)


def _fwd(x, w):
    return depthwise3x3x3_fwd(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dx: correlate the cotangent with the flipped kernel (stride-1 SAME
    # conv is self-transpose up to kernel flip).
    dx = depthwise3x3x3_fwd(g, _flip_w(w)).astype(x.dtype)
    # dw[dt,dh,dw,c] = sum_{b,t,h,w} xp[t+dt, h+dh, w+dw, c] * g[t,h,w,c].
    # Computed with XLA reductions over shifted slices (27 fused reduces; no
    # grouped conv involved).
    b, t, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    taps = []
    for dt in range(3):
        for dh in range(3):
            for dwi in range(3):
                patch = xp[:, dt : dt + t, dh : dh + h, dwi : dwi + wd, :]
                taps.append(jnp.sum(patch * g32, axis=(0, 1, 2, 3)))
    dw = jnp.stack(taps).reshape(3, 3, 3, c).astype(w.dtype)
    return dx, dw


depthwise3x3x3.defvjp(_fwd, _bwd)
