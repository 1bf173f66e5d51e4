"""Pallas TPU kernels: fused MViT attention with decomposed rel-pos bias.

The MViT attention shape regime is "tall Q, short K": after KV pooling,
Nk <= ~1600 while Nq reaches 25k at stage 1 (MViTv2-S 16x4 @ 224^2). The
whole K/V block fits in VMEM, so both kernels tile over Q rows only. The
[Nq, Nk] attention matrix never touches HBM — in the XLA lowering it is
the single largest traffic term of the train step (score-shaped fusions
are ~6 GB/step at bs 8, `tools/hlo_dump.py`).

Layout contract (matches the model's tokens-major activations):
  q, rcat, do   [B, Nq, H, *]   — consumed in place, no transpose/pad copy;
                                   per-head values read as ref[:, hd, :]
  o, dq, drcat  [B, Nq, H * *]  — written as a lane-concat over heads into
                                   a merged minor dim; the wrapper's
                                   un-merge reshape is layout-free
  k, v, dk, dv  [B, H, Nkp, D]  — transposed + lane-padded by the wrapper
                                   (small: K/V are pooled)
The grid is (B, q_tiles); each block carries all H heads (TPU Pallas
requires the last two block dims be full or (8,128)-divisible, so heads
cannot be a squeezed middle dim) and the kernel unrolls a static head
loop. K/V re-DMA only when b changes (q_tiles is the fastest grid dim).

Forward, per Q tile and head:
    s = (q_tile * scale) @ K^T + rcat_tile @ Ecat   (f32 accumulation)
    p = softmax(s); o = p @ V

Backward (flash-style recompute): recompute s/p in VMEM, write dq and the
per-row rel-table grads, accumulate dk/dv across Q tiles (their output
blocks map to (b, 0, 0, 0) for every tile index, persisting across the
sequential TPU grid). Tail-tile rows (q_tiles * tile_q > Nq) are zeroed
on load so out-of-bounds garbage cannot reach the dk/dv accumulators.

The decomposed relative-position bias (`attention.py:67-159` upstream)
rides the concatenated per-row table rcat expanded inside the kernel by
one constant 0/1 matrix: bias = rcat @ Ecat. The narrow tables pay the
128-lane padding tax once instead of three times.

k layout: column 0 is the cls token (bias 0 — the tables' cls rows are
zeroed by the caller), columns 1.. enumerate (kt, kh, kw) row-major,
columns >= Nk are padding masked to -inf.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


# Tests set this to force interpreter mode regardless of backend.
INTERPRET_OVERRIDE: Optional[bool] = None


def _interpret():
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


def _expansion_matrix(kt, kh, kw, nk, nkp, has_cls, with_rt):
    """Ecat [KH+KW(+KT), NKP] 0/1 expansion + additive -inf padding mask.

    k column j: 0 = cls (zero bias); j-1 = (t*KH + h)*KW + w; j >= nk is
    padding.
    """
    off = 1 if has_cls else 0
    l = kh + kw + (kt if with_rt else 0)
    E = np.zeros((l, nkp), np.float32)
    for t in range(kt):
        for h in range(kh):
            for w in range(kw):
                j = off + (t * kh + h) * kw + w
                E[h, j] = 1.0
                E[kh + w, j] = 1.0
                if with_rt:
                    E[kh + kw + t, j] = 1.0
    mask = np.zeros((1, nkp), np.float32)
    mask[0, nk:] = -1e30
    return E, mask


def _pick_tile(nq, nk_pad, h=1):
    """Q-row tile: sized against the f32 [tile, nk_pad] score temporaries
    (VMEM budget; the unrolled head loop keeps some per-head buffers live,
    so multi-head shrinks the tile), bigger for narrow K to cut per-tile
    overhead, rounded so tiles cover nq with minimal tail waste. Multiple
    of 16 (bf16 sublane tile). Empirical v5e limits: h2 @ (1024, 512)
    OOMs the 16M scoped vmem in bwd; h1 @ (1024, 512) and h2 @ (256,
    1664) fit."""
    if nk_pad <= 512:
        target = 1024 if h == 1 else 512
    elif nk_pad <= 1024:
        target = 512 if h == 1 else 256
    else:
        target = 256 if h <= 2 else 128
    ntiles = max(1, -(-nq // target))
    return _round_up(-(-nq // ntiles), 16), ntiles


def bwd_fits_vmem(nk, h, d):
    """Whether the backward kernel's K/V-side buffers fit scoped VMEM.

    dk/dv accumulate in f32 across Q tiles, so k, v (bf16) and dk, dv
    (f32) all stay resident for a full grid row: 12*h*nk_pad*d bytes that
    no tile size can shrink. The v5e scoped-vmem stack limit is 16 MB;
    leave >=4 MB headroom for the Q-side tiles and score temporaries
    (h=8, nk_pad=1664, d=96 -> 15.3 MB fixed: observed stack OOM)."""
    nk_pad = _round_up(nk, 128)
    return 12 * h * nk_pad * d <= 12 * 1024 * 1024


def _scores(q, k, rcat, ecat, mask, scale):
    """s = (q*scale) @ k^T + rcat @ Ecat + mask, f32 [TQ, NKP]."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    bias = jax.lax.dot_general(
        rcat.astype(jnp.float32), ecat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return s + bias + mask


def _softmax(s):
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _cat(parts):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _qh(ref, hd, nheads):
    """Per-head [TQ, last] value. nheads == 1 runs a fast path: the wrapper
    drops the H axis entirely (2-D refs, no slicing/concat relayouts)."""
    return ref[...] if nheads == 1 else ref[:, hd, :]


def _kh(ref, hd, nheads):
    return ref[...] if nheads == 1 else ref[hd]


def _fwd_kernel(q_ref, k_ref, v_ref, rcat_ref, ecat_ref, mask_ref, o_ref,
                *, scale, nheads):
    ecat = ecat_ref[...]
    mask = mask_ref[...]
    outs = []
    for hd in range(nheads):
        s = _scores(
            _qh(q_ref, hd, nheads), _kh(k_ref, hd, nheads),
            _qh(rcat_ref, hd, nheads), ecat, mask, scale
        )
        p = _softmax(s).astype(v_ref.dtype)
        outs.append(
            jax.lax.dot_general(
                p, _kh(v_ref, hd, nheads),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
        )
    o_ref[...] = _cat(outs)


def _bwd_kernel(q_ref, k_ref, v_ref, rcat_ref, ecat_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, drcat_ref, *, scale, nq, tile_q,
                nheads):
    i = pl.program_id(1)
    # Tail-tile rows beyond nq hold out-of-bounds garbage: zero them so no
    # inf/NaN can reach the matmuls that accumulate dk/dv.
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_q, 1), 0) + i * tile_q
    ) < nq

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dt = q_ref.dtype
    ecat = ecat_ref[...]
    mask = mask_ref[...]
    dqs, drs = [], []
    for hd in range(nheads):
        q = jnp.where(row_ok, _qh(q_ref, hd, nheads), 0)
        do = jnp.where(
            row_ok, _qh(do_ref, hd, nheads).astype(jnp.float32), 0
        )
        k = _kh(k_ref, hd, nheads)
        v = _kh(v_ref, hd, nheads)
        s = _scores(q, k, _qh(rcat_ref, hd, nheads), ecat, mask, scale)
        # Dead rows: s = 0 everywhere -> uniform softmax, but do = 0 zeroes
        # dp and hence ds, so they contribute nothing to dk/dv/drcat.
        s = jnp.where(row_ok, s, 0.0)
        p = _softmax(s)

        p_c = p.astype(dt)
        do_c = do.astype(dt)
        dv_c = jax.lax.dot_general(
            p_c, do_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NKP, D]
        dp = jax.lax.dot_general(
            do_c, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, NKP]
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        ds_c = ds.astype(dt)

        dqs.append(
            (
                jax.lax.dot_general(
                    ds_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            ).astype(dq_ref.dtype)
        )
        dk_c = jax.lax.dot_general(
            ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [NKP, D]

        if nheads == 1:
            dk_ref[...] += dk_c
            dv_ref[...] += dv_c
        else:
            dk_ref[hd] += dk_c
            dv_ref[hd] += dv_c

        drs.append(
            jax.lax.dot_general(
                ds, ecat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(drcat_ref.dtype)
        )
    dq_ref[...] = _cat(dqs)
    drcat_ref[...] = _cat(drs)


def _prep(q, k, v, rh, rw, rt):
    """Transpose + lane-pad the (small, pooled) K/V side; concat the rel
    tables. The big Q-side tensors are never copied. For H == 1 the head
    axis is dropped everywhere (free reshapes) so the kernel runs on 2-D
    refs with no per-head slicing."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    nk_pad = _round_up(nk, 128)
    pad_k = ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0))
    kt_ = jnp.pad(k.transpose(0, 2, 1, 3), pad_k)
    vt_ = jnp.pad(v.transpose(0, 2, 1, 3), pad_k)
    tables = [rh, rw] + ([rt] if rt is not None else [])
    rcat = jnp.concatenate(tables, axis=-1)
    if h == 1:
        q = q.reshape(b, nq, d)
        rcat = rcat.reshape(b, nq, -1)
        kt_ = kt_.reshape(b, nk_pad, d)
        vt_ = vt_.reshape(b, nk_pad, d)
    return q, kt_, vt_, rcat, nk, nk_pad


def _specs(tile_q, h, nk_pad, d):
    if h == 1:
        # Flat fast path: 2-D refs, no per-head slicing.
        qside = lambda last: pl.BlockSpec(
            (None, tile_q, last), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        )
        qmerge = qside
        kvside = pl.BlockSpec(
            (None, nk_pad, d), lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        # 4-D q-side inputs [B, Nq, H, last]: full (H, last) minor block,
        # per-head values read inside the kernel.
        qside = lambda last: pl.BlockSpec(
            (None, tile_q, h, last), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        # Merged q-side outputs [B, Nq, H*last]: heads lane-concatenated.
        qmerge = lambda last: pl.BlockSpec(
            (None, tile_q, h * last), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        )
        kvside = pl.BlockSpec(
            (None, h, nk_pad, d), lambda b, i: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    fixed = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    return qside, qmerge, kvside, fixed


def _attn_pallas_fwd_impl(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls):
    """q [B, Nq, H, D]; k/v [B, Nk, H, D]; rh [B, Nq, H, KH]; ... ->
    [B, Nq, H, D]."""
    b, nq, h, d = q.shape
    qk, kt_, vt_, rcat, nk, nk_pad = _prep(q, k, v, rh, rw, rt)
    l = rcat.shape[-1]
    E, mask = _expansion_matrix(
        kt, kh, kw, nk, nk_pad, has_cls, with_rt=rt is not None
    )
    tile_q, ntiles = _pick_tile(nq, nk_pad, h)
    qside, qmerge, kvside, fixed = _specs(tile_q, h, nk_pad, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nheads=h),
        grid=(b, ntiles),
        in_specs=[
            qside(d), kvside, kvside, qside(l),
            fixed(E.shape), fixed(mask.shape),
        ],
        out_specs=qmerge(d),
        out_shape=jax.ShapeDtypeStruct(
            (b, nq, h * d) if h > 1 else (b, nq, d), q.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * ntiles * tile_q * nk_pad * d,
            bytes_accessed=2 * (2 * b * nq * h * d + 2 * b * h * nk_pad * d),
            transcendentals=b * h * ntiles * tile_q * nk_pad,
        ),
        interpret=_interpret(),
    )(qk, kt_, vt_, rcat, jnp.asarray(E), jnp.asarray(mask))
    return out.reshape(b, nq, h, d)


def _attn_pallas_bwd_impl(q, k, v, rh, rw, rt, do, scale, kt, kh, kw,
                          has_cls):
    b, nq, h, d = q.shape
    kh_n = rh.shape[-1]
    kw_n = rw.shape[-1]
    qk, kt_, vt_, rcat, nk, nk_pad = _prep(q, k, v, rh, rw, rt)
    l = rcat.shape[-1]
    E, mask = _expansion_matrix(
        kt, kh, kw, nk, nk_pad, has_cls, with_rt=rt is not None
    )
    tile_q, ntiles = _pick_tile(nq, nk_pad, h)
    qside, qmerge, kvside, fixed = _specs(tile_q, h, nk_pad, d)
    kv_shape = (b, h, nk_pad, d) if h > 1 else (b, nk_pad, d)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, nq=nq, tile_q=tile_q, nheads=h
        ),
        grid=(b, ntiles),
        in_specs=[
            qside(d), kvside, kvside, qside(l),
            fixed(E.shape), fixed(mask.shape),
            qside(d),
        ],
        out_specs=[qmerge(d), kvside, kvside, qmerge(l)],
        out_shape=[
            jax.ShapeDtypeStruct(
                (b, nq, h * d) if h > 1 else (b, nq, d), q.dtype
            ),
            jax.ShapeDtypeStruct(kv_shape, jnp.float32),
            jax.ShapeDtypeStruct(kv_shape, jnp.float32),
            jax.ShapeDtypeStruct(
                (b, nq, h * l) if h > 1 else (b, nq, l), jnp.float32
            ),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * b * h * ntiles * tile_q * nk_pad * d,
            bytes_accessed=2 * (4 * b * nq * h * d + 4 * b * h * nk_pad * d),
            transcendentals=b * h * ntiles * tile_q * nk_pad,
        ),
        interpret=_interpret(),
    )(qk, kt_, vt_, rcat, jnp.asarray(E), jnp.asarray(mask),
      do if h > 1 else do.reshape(b, nq, d))
    dq = outs[0].reshape(b, nq, h, d)
    dkp = outs[1].reshape(b, h, nk_pad, d)
    dvp = outs[2].reshape(b, h, nk_pad, d)
    dk = dkp[:, :, :nk].transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dvp[:, :, :nk].transpose(0, 2, 1, 3).astype(v.dtype)
    drcat = outs[3].reshape(b, nq, h, l)
    drh = drcat[..., :kh_n].astype(rh.dtype)
    drw = drcat[..., kh_n : kh_n + kw_n].astype(rw.dtype)
    drt = (
        drcat[..., kh_n + kw_n :].astype(rt.dtype) if rt is not None else None
    )
    return dq, dk, dv, drh, drw, drt


def _reference_attention(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls):
    """XLA reference (tests; also documents the exact math).

    Same [B, N, H, D] layout as the kernel.
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    bias = jnp.repeat(rh.astype(jnp.float32), kw, axis=-1) + jnp.tile(
        rw.astype(jnp.float32), (1, 1, 1, kh)
    )
    bias = jnp.tile(bias, (1, 1, 1, kt))
    if rt is not None:
        bias = bias + jnp.repeat(rt.astype(jnp.float32), kh * kw, axis=-1)
    if has_cls:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (1, 0)))
    s = s + bias.transpose(0, 2, 1, 3)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def fused_rel_attention(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls):
    """Fused attention with decomposed rel-pos bias.

    q [B, Nq, H, D]; k, v [B, Nk, H, D]; rh [B, Nq, H, KH];
    rw [B, Nq, H, KW]; rt [B, Nq, H, KT] or None. The caller zeroes the
    cls rows of rh/rw/rt.
    """
    return _attn_pallas_fwd_impl(
        q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls
    )


def _fwd(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls):
    out = _attn_pallas_fwd_impl(
        q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls
    )
    return out, (q, k, v, rh, rw, rt)


def _bwd(scale, kt, kh, kw, has_cls, residuals, g):
    q, k, v, rh, rw, rt = residuals
    return _attn_pallas_bwd_impl(
        q, k, v, rh, rw, rt, g, scale, kt, kh, kw, has_cls
    )


fused_rel_attention.defvjp(_fwd, _bwd)
