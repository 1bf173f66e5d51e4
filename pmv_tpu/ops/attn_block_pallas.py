"""Pallas TPU kernel: fused MViT attention half-block.

Extends ops/attention_pallas.py (fused rel-pos attention) by absorbing the
two ops downstream of the softmax into the same kernel:

    o_h   = softmax((q_h * scale) @ k_h^T + rcat_h @ Ecat) @ v_h
    o     = concat_h(o_h) (+ q merged, rows != cls — residual pooling,
            `MViT/slowfast/models/attention.py:450-454`)
    y     = o @ Wp + bp                       (output projection)

Why absorb: the standalone attention kernel ties XLA per geometry but
LOSES end-to-end (ROADMAP round-2 log) — pallas_call is a fusion barrier
and XLA re-fuses the surrounding projection into its own einsums. With the
projection and residual inside, the kernel's HBM I/O is exactly q (read),
k/v (read, pooled ~small), rcat (read), y (write): the [Nq, Nk] attention
matrix, the pre-projection context, and the probs' layout copies never
touch HBM in either direction.

Backward is flash-style recompute: per Q tile, s/p rebuild in VMEM; dk/dv
and dWp/dbp accumulate in f32 output blocks pinned across the sequential
grid; dq/drcat stream out tile by tile. Layout contract matches
ops/attention_pallas.py (tokens-major q-side consumed in place; K/V side
transposed + lane-padded by the wrapper).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmv_tpu.ops.attention_pallas import (
    _cat,
    _expansion_matrix,
    _kh,
    _pick_tile,
    _qh,
    _round_up,
    _scores,
    _softmax,
)

INTERPRET_OVERRIDE: Optional[bool] = None

# In a large jitted module XLA's memory-space assignment may pin kernel
# outputs in VMEM (S(1)), stacking on top of the kernel's own scoped
# allocation; the default 16 MiB scoped limit then fails compile for
# geometries that fit standalone. v5e has 128 MiB VMEM — raise the scoped
# ceiling and leave placement to the compiler.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _interpret():
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


def bwd_fits_vmem(nk, h, d, dim_out):
    """K/V-side residency (as attention_pallas.bwd_fits_vmem) plus the
    dWp [H*D, Dout] f32 accumulator + Wp copies."""
    nk_pad = _round_up(nk, 128)
    fixed = 12 * h * nk_pad * d + 6 * h * d * dim_out
    return fixed <= 12 * 1024 * 1024


def _res_mask(tile_q, i, has_cls):
    """Residual-pooling row mask: every row except the global cls row 0."""
    if not has_cls:
        return None
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_q, 1), 0) + i * tile_q
    return rows > 0


def _fwd_kernel(q_ref, k_ref, v_ref, rcat_ref, ecat_ref, mask_ref,
                wp_ref, bp_ref, y_ref, *, scale, nheads, has_cls,
                residual, tile_q):
    i = pl.program_id(1)
    ecat = ecat_ref[...]
    mask = mask_ref[...]
    rm = _res_mask(tile_q, i, has_cls) if residual else None
    outs = []
    for hd in range(nheads):
        s = _scores(
            _qh(q_ref, hd, nheads), _kh(k_ref, hd, nheads),
            _qh(rcat_ref, hd, nheads), ecat, mask, scale
        )
        p = _softmax(s).astype(v_ref.dtype)
        o_h = jax.lax.dot_general(
            p, _kh(v_ref, hd, nheads),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(q_ref.dtype)
        if residual:
            # Per-head residual merge: a (TQ, H, D) -> (TQ, H*D) shape
            # cast is not lowerable for non-lane-aligned D, so q is added
            # head by head before the lane-concat.
            qm = _qh(q_ref, hd, nheads)
            o_h = o_h + (qm if rm is None else jnp.where(rm, qm, 0))
        outs.append(o_h)
    o = _cat(outs)
    y = jax.lax.dot_general(
        o, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)
    y_ref[...] = y + bp_ref[0]


def _bwd_kernel(q_ref, k_ref, v_ref, rcat_ref, ecat_ref, mask_ref,
                wp_ref, bp_ref, dy_ref,
                dq_ref, dk_ref, dv_ref, drcat_ref, dwp_ref, dbp_ref,
                *, scale, nq, tile_q, nheads, has_cls, residual, d):
    i = pl.program_id(1)
    bi = pl.program_id(0)
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_q, 1), 0) + i * tile_q
    ) < nq

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dt = q_ref.dtype
    ecat = ecat_ref[...]
    mask = mask_ref[...]
    dy = jnp.where(row_ok, dy_ref[...].astype(jnp.float32), 0).astype(dt)
    dbp_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    rm = _res_mask(tile_q, i, has_cls)

    # One pass per head: dWp's rows for head hd only involve o_hd, and
    # do_hd = dy @ Wp[hd rows]^T — so o never needs to exist merged and no
    # per-head p has to stay resident across the loop.
    dqs, drs = [], []
    for hd in range(nheads):
        q = jnp.where(row_ok, _qh(q_ref, hd, nheads), 0)
        k = _kh(k_ref, hd, nheads)
        v = _kh(v_ref, hd, nheads)
        s = _scores(
            q, k, _qh(rcat_ref, hd, nheads), ecat, mask, scale
        )
        s = jnp.where(row_ok, s, 0.0)
        p = _softmax(s)
        p_c = p.astype(dt)
        o_h = jax.lax.dot_general(
            p_c, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        if residual:
            o_h = o_h + (q if rm is None else jnp.where(rm, q, 0))
        wp_h = (
            wp_ref[...]
            if nheads == 1
            else wp_ref[pl.ds(hd * d, d), :]
        )
        if nheads == 1:
            dwp_ref[...] += jax.lax.dot_general(
                o_h, dy, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            dwp_ref[pl.ds(hd * d, d), :] += jax.lax.dot_general(
                o_h, dy, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        do_h = jax.lax.dot_general(
            dy, wp_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        do_c = do_h.astype(dt)
        dv_c = jax.lax.dot_general(
            p_c, do_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_c, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        ds_c = ds.astype(dt)
        dq_h = (
            jax.lax.dot_general(
                ds_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        )
        if residual:
            # d(residual-pooling): q also feeds o directly (rows != cls).
            rm = _res_mask(dq_h.shape[0], i, has_cls)
            dq_h = dq_h + (do_h if rm is None else jnp.where(rm, do_h, 0))
        dqs.append(dq_h.astype(dq_ref.dtype))
        dk_c = jax.lax.dot_general(
            ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
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
    b, nq, h, dd = q.shape
    nk = k.shape[1]
    nk_pad = _round_up(nk, 128)
    pad_k = ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0))
    kt_ = jnp.pad(k.transpose(0, 2, 1, 3), pad_k)
    vt_ = jnp.pad(v.transpose(0, 2, 1, 3), pad_k)
    tables = [rh, rw] + ([rt] if rt is not None else [])
    rcat = jnp.concatenate(tables, axis=-1)
    if h == 1:
        q = q.reshape(b, nq, dd)
        rcat = rcat.reshape(b, nq, -1)
        kt_ = kt_.reshape(b, nk_pad, dd)
        vt_ = vt_.reshape(b, nk_pad, dd)
    return q, kt_, vt_, rcat, nk, nk_pad


def _specs(tile_q, h, nk_pad, d):
    if h == 1:
        qside = lambda last: pl.BlockSpec(
            (None, tile_q, last), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        )
        kvside = pl.BlockSpec(
            (None, nk_pad, d), lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        qside = lambda last: pl.BlockSpec(
            (None, tile_q, h, last), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kvside = pl.BlockSpec(
            (None, h, nk_pad, d), lambda b, i: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    qmerge = lambda last: pl.BlockSpec(
        (None, tile_q, last), lambda b, i: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    fixed = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    return qside, qmerge, kvside, fixed


def _fwd_impl(q, k, v, rh, rw, rt, wp, bp, scale, kt, kh, kw, has_cls,
              residual):
    b, nq, h, d = q.shape
    dim_out = wp.shape[-1]
    qk, kt_, vt_, rcat, nk, nk_pad = _prep(q, k, v, rh, rw, rt)
    l = rcat.shape[-1]
    E, mask = _expansion_matrix(
        kt, kh, kw, nk, nk_pad, has_cls, with_rt=rt is not None
    )
    tile_q, ntiles = _pick_tile(nq, nk_pad, h)
    qside, qmerge, kvside, fixed = _specs(tile_q, h, nk_pad, d)
    dt = q.dtype
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, nheads=h, has_cls=has_cls,
            residual=residual, tile_q=tile_q,
        ),
        grid=(b, ntiles),
        in_specs=[
            qside(d), kvside, kvside, qside(l),
            fixed(E.shape), fixed(mask.shape),
            fixed((h * d, dim_out)), fixed((1, dim_out)),
        ],
        out_specs=qmerge(dim_out),
        out_shape=jax.ShapeDtypeStruct((b, nq, dim_out), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ntiles * tile_q * (2 * nk_pad + dim_out) * d,
            bytes_accessed=2 * (2 * b * nq * h * d + 2 * b * h * nk_pad * d),
            transcendentals=b * h * ntiles * tile_q * nk_pad,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(qk, kt_, vt_, rcat, jnp.asarray(E), jnp.asarray(mask),
      wp.astype(dt), bp.reshape(1, dim_out).astype(dt))
    return out


def _bwd_impl(q, k, v, rh, rw, rt, wp, bp, dy, scale, kt, kh, kw, has_cls,
              residual):
    b, nq, h, d = q.shape
    dim_out = wp.shape[-1]
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
    dt = q.dtype
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, nq=nq, tile_q=tile_q, nheads=h,
            has_cls=has_cls, residual=residual, d=d,
        ),
        grid=(b, ntiles),
        in_specs=[
            qside(d), kvside, kvside, qside(l),
            fixed(E.shape), fixed(mask.shape),
            fixed((h * d, dim_out)), fixed((1, dim_out)),
            qmerge(dim_out),
        ],
        out_specs=[
            qmerge(h * d), kvside, kvside, qmerge(h * l),
            fixed((h * d, dim_out)), fixed((1, dim_out)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq, h * d), dt),
            jax.ShapeDtypeStruct(kv_shape, jnp.float32),
            jax.ShapeDtypeStruct(kv_shape, jnp.float32),
            jax.ShapeDtypeStruct((b, nq, h * l), jnp.float32),
            jax.ShapeDtypeStruct((h * d, dim_out), jnp.float32),
            jax.ShapeDtypeStruct((1, dim_out), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ntiles * tile_q * (5 * nk_pad + 2 * dim_out) * d,
            bytes_accessed=2 * (4 * b * nq * h * d + 4 * b * h * nk_pad * d),
            transcendentals=b * h * ntiles * tile_q * nk_pad,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(qk, kt_, vt_, rcat, jnp.asarray(E), jnp.asarray(mask),
      wp.astype(dt), bp.reshape(1, dim_out).astype(dt), dy)
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
    dwp = outs[4].astype(wp.dtype)
    dbp = outs[5].reshape(bp.shape).astype(bp.dtype)
    return dq, dk, dv, drh, drw, drt, dwp, dbp


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def fused_attn_proj(q, k, v, rh, rw, rt, wp, bp, scale, kt, kh, kw,
                    has_cls, residual):
    """y [B, Nq, Dout] = proj(attn(q, k, v, rel-pos) [+ residual-pool q]).

    q [B, Nq, H, D]; k, v [B, Nk, H, D]; rh/rw/rt per-row rel tables with
    zeroed cls rows; wp [H*D, Dout]; bp [Dout].
    """
    return _fwd_impl(
        q, k, v, rh, rw, rt, wp, bp, scale, kt, kh, kw, has_cls, residual
    )


def _vjp_fwd(q, k, v, rh, rw, rt, wp, bp, scale, kt, kh, kw, has_cls,
             residual):
    y = _fwd_impl(
        q, k, v, rh, rw, rt, wp, bp, scale, kt, kh, kw, has_cls, residual
    )
    return y, (q, k, v, rh, rw, rt, wp, bp)


def _reference_block(q, k, v, rh, rw, rt, wp, bp, scale, kt, kh, kw,
                     has_cls, residual):
    """XLA reference of the fused op (tests + fallback backward)."""
    from pmv_tpu.ops.attention_pallas import _reference_attention

    b, nq, h, d = q.shape
    x = _reference_attention(
        q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls
    )
    if residual:
        if has_cls:
            x = x.at[:, 1:].add(q[:, 1:])
        else:
            x = x + q
    x = x.reshape(b, nq, h * d)
    return (
        jnp.dot(x, wp.astype(x.dtype)) + bp.astype(x.dtype)
    )


def _vjp_bwd(scale, kt, kh, kw, has_cls, residual, res, dy):
    q, k, v, rh, rw, rt, wp, bp = res
    if bwd_fits_vmem(k.shape[1], q.shape[2], q.shape[3], wp.shape[-1]):
        return _bwd_impl(
            q, k, v, rh, rw, rt, wp, bp, dy, scale, kt, kh, kw, has_cls,
            residual,
        )
    # Wide-K many-head geometries (block14: h=8, nk=1569) exceed the f32
    # dk/dv VMEM residency: differentiate the XLA reference instead. The
    # forward stays fused (probs never written in fwd); the backward
    # materializes them once, like plain XLA's backward.
    def f(q_, k_, v_, rh_, rw_, rt_, wp_, bp_):
        return _reference_block(
            q_, k_, v_, rh_, rw_, rt_, wp_, bp_, scale, kt, kh, kw,
            has_cls, residual,
        )

    if rt is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_, rh_, rw_, wp_, bp_: f(
                q_, k_, v_, rh_, rw_, None, wp_, bp_
            ),
            q, k, v, rh, rw, wp, bp,
        )
        dq, dk, dv, drh, drw, dwp, dbp = vjp(dy)
        return dq, dk, dv, drh, drw, None, dwp, dbp
    _, vjp = jax.vjp(f, q, k, v, rh, rw, rt, wp, bp)
    return vjp(dy)


fused_attn_proj.defvjp(_vjp_fwd, _vjp_bwd)
