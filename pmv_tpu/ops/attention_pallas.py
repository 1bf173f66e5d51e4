"""Pallas TPU kernels: fused MViT attention with decomposed rel-pos bias.

The MViT attention shape regime is "tall Q, short K": after KV pooling,
Nk <= ~400 while Nq reaches 25k at stage 1 (MViTv2-S 16x4 @ 224^2). The
whole K/V block fits in VMEM, so both kernels tile over Q rows only.

Forward, per Q tile:
    s = (q_tile @ K^T) * scale + bias_tile      (f32 accumulation)
    p = softmax(s); o = p @ V

Backward (flash-style recompute): recompute s/p in VMEM, write dq and the
per-row rel-table grads, accumulate dk/dv across Q tiles (their output
blocks map to (b, 0, 0) for every tile index, persisting across the
sequential TPU grid).

The decomposed relative-position bias (`attention.py:67-159`) rides a single
concatenated per-row table rcat = [rh | rw | rt] ([Nq, KH+KW+KT]) expanded
inside the kernel by one constant 0/1 matrix: bias = rcat @ Ecat. The
[Nq, Nk] bias/attention matrices never touch HBM, and the narrow tables pay
the 128-lane padding tax once instead of three times.

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


def _softmax_fwd(q, k, rcat, ecat, mask, scale):
    """Shared s/p recompute: returns p [TQ, NKP] f32."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    bias = jax.lax.dot_general(
        rcat.astype(jnp.float32), ecat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias + mask
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, rcat_ref, ecat_ref, mask_ref, o_ref,
                *, scale):
    p = _softmax_fwd(
        q_ref[0], k_ref[0], rcat_ref[0], ecat_ref[:], mask_ref[:], scale
    ).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, rcat_ref, ecat_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, drcat_ref, *, scale):
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    p = _softmax_fwd(q, k, rcat_ref[0], ecat_ref[:], mask_ref[:], scale)

    dv_c = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [NKP, D]
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, NKP]
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))

    dq_ref[0] = (
        jax.lax.dot_general(
            ds, k.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    ).astype(dq_ref.dtype)
    dk_c = jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_c.astype(dk_ref.dtype)
    dv_ref[0] += dv_c.astype(dv_ref.dtype)

    drcat_ref[0] = jax.lax.dot_general(
        ds, ecat_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(drcat_ref.dtype)


def _prep(q, k, v, rh, rw, rt, kt, kh, kw, has_cls, tile_q):
    bh, nq, d = q.shape
    nk = k.shape[1]
    nq_pad = _round_up(nq, tile_q)
    nk_pad = _round_up(nk, 128)
    pad_q = ((0, 0), (0, nq_pad - nq), (0, 0))
    pad_k = ((0, 0), (0, nk_pad - nk), (0, 0))
    tables = [rh, rw] + ([rt] if rt is not None else [])
    rcat = jnp.pad(jnp.concatenate(tables, axis=-1), pad_q)
    E, mask = _expansion_matrix(
        kt, kh, kw, nk, nk_pad, has_cls, with_rt=rt is not None
    )
    return (
        jnp.pad(q, pad_q), jnp.pad(k, pad_k), jnp.pad(v, pad_k), rcat,
        jnp.asarray(E), jnp.asarray(mask), nq_pad, nk_pad,
    )


def _tile_spec(tile_q, last):
    return pl.BlockSpec((1, tile_q, last), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


def _fixed_spec(shape):
    return pl.BlockSpec(shape, lambda b, i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _attn_pallas_fwd_impl(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls,
                          tile_q=512):
    """q [BH, Nq, D], k/v [BH, Nk, D], rh [BH, Nq, KH], ... -> [BH, Nq, D]."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    qp, kp, vp, rcat, E, mask, nq_pad, nk_pad = _prep(
        q, k, v, rh, rw, rt, kt, kh, kw, has_cls, tile_q
    )
    kv_spec = pl.BlockSpec((1, nk_pad, d), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh, nq_pad // tile_q),
        in_specs=[
            _tile_spec(tile_q, d), kv_spec, kv_spec,
            _tile_spec(tile_q, rcat.shape[-1]),
            _fixed_spec(E.shape), _fixed_spec(mask.shape),
        ],
        out_specs=_tile_spec(tile_q, d),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nq_pad * nk_pad * d,
            bytes_accessed=(2 * bh * nq_pad * d + 2 * bh * nk_pad * d) * 2,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, rcat, E, mask)
    return out[:, :nq]


def _attn_pallas_bwd_impl(q, k, v, rh, rw, rt, do, scale, kt, kh, kw,
                          has_cls, tile_q=512):
    bh, nq, d = q.shape
    nk = k.shape[1]
    qp, kp, vp, rcat, E, mask, nq_pad, nk_pad = _prep(
        q, k, v, rh, rw, rt, kt, kh, kw, has_cls, tile_q
    )
    dop = jnp.pad(do, ((0, 0), (0, nq_pad - nq), (0, 0)))
    kv_spec = pl.BlockSpec((1, nk_pad, d), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    l = rcat.shape[-1]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh, nq_pad // tile_q),
        in_specs=[
            _tile_spec(tile_q, d), kv_spec, kv_spec,
            _tile_spec(tile_q, l),
            _fixed_spec(E.shape), _fixed_spec(mask.shape),
            _tile_spec(tile_q, d),
        ],
        out_specs=[
            _tile_spec(tile_q, d),
            kv_spec, kv_spec,
            _tile_spec(tile_q, l),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nq_pad, l), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, rcat, E, mask, dop)
    dq = outs[0][:, :nq]
    dk = outs[1][:, :nk].astype(k.dtype)
    dv = outs[2][:, :nk].astype(v.dtype)
    drcat = outs[3][:, :nq]
    drh = drcat[..., :kh].astype(rh.dtype)
    drw = drcat[..., kh : kh + kw].astype(rw.dtype)
    drt = (
        drcat[..., kh + kw :].astype(rt.dtype) if rt is not None else None
    )
    return dq, dk, dv, drh, drw, drt


def _reference_attention(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls):
    """XLA reference (tests; also documents the exact math)."""
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    bias = jnp.repeat(rh.astype(jnp.float32), kw, axis=-1) + jnp.tile(
        rw.astype(jnp.float32), (1, 1, kh)
    )
    bias = jnp.tile(bias, (1, 1, kt))
    if rt is not None:
        bias = bias + jnp.repeat(rt.astype(jnp.float32), kh * kw, axis=-1)
    if has_cls:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (1, 0)))
    s = s + bias
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def fused_rel_attention(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls):
    """Fused attention with decomposed rel-pos bias.

    q [BH, Nq, D]; k, v [BH, Nk, D]; rh [BH, Nq, KH]; rw [BH, Nq, KW];
    rt [BH, Nq, KT] or None. The caller zeroes the cls rows of rh/rw/rt.
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
