"""Pallas TPU kernel: fused MViT attention with decomposed rel-pos bias.

The MViT attention shape regime is "tall Q, short K": after KV pooling,
Nk <= ~400 while Nq reaches 25k at stage 1 (MViTv2-S 16x4 @ 224^2). The
whole K/V block fits in VMEM, so the kernel tiles over Q rows only and
computes, per tile:

    s = (q_tile @ K^T) * scale + bias_tile      (f32 accumulation)
    p = softmax(s)                              (row-wise, full Nk in VMEM)
    o = p @ V

The decomposed relative-position bias (`attention.py:67-159`) is expanded
*inside* the kernel from three narrow per-row tables (rh [Nq, KH],
rw [Nq, KW], rt [Nq, KT]) — the [Nq, Nk] bias and attention matrices never
touch HBM. This removes the dominant memory traffic of the XLA path
(measured 63% of MViTv2-S forward before layout fixes).

k layout: column 0 is the cls token (bias 0 — the tables' cls row is
zeroed by the caller), columns 1.. enumerate (kt, kh, kw) row-major,
columns >= Nk are padding masked to -inf.

Backward: custom_vjp recomputing attention with standard XLA ops (the
flash backward kernel is a later-round optimization; the recompute path
matches what the non-fused graph does anyway).
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


def _expansion_matrices(kt, kh, kw, nk, nkp, has_cls, with_rt):
    """Constant 0/1 matrices that expand the decomposed per-row tables to
    the key axis via tiny MXU matmuls (Mosaic-friendly — vector reshapes of
    tiny minor dims are not lowerable).

    k column j: 0 = cls (zero bias); j-1 = (t*KH + h)*KW + w; j >= nk is
    padding, masked via an additive -inf row.
    """
    off = 1 if has_cls else 0
    Eh = np.zeros((kh, nkp), np.float32)
    Ew = np.zeros((kw, nkp), np.float32)
    Et = np.zeros((kt, nkp), np.float32)
    for t in range(kt):
        for h in range(kh):
            for w in range(kw):
                j = off + (t * kh + h) * kw + w
                Eh[h, j] = 1.0
                Ew[w, j] = 1.0
                Et[t, j] = 1.0
    mask = np.zeros((1, nkp), np.float32)
    mask[0, nk:] = -1e30
    return Eh, Ew, (Et if with_rt else np.zeros((kt, nkp), np.float32)), mask


def _attn_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, rt_ref,
                 eh_ref, ew_ref, et_ref, mask_ref, o_ref, *, scale):
    """One Q tile vs full K/V. Shapes (leading grid dims removed):
    q [TQ, D], k/v [NKP, D], rh [TQ, KH], rw [TQ, KW], rt [TQ, KT],
    expansion matrices eh [KH, NKP], ew [KW, NKP], et [KT, NKP],
    mask [1, NKP], o [TQ, D].
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [TQ, NKP]

    # Bias expansion as constant matmuls: [TQ, KH] @ [KH, NKP] etc.
    bias = jax.lax.dot_general(
        rh_ref[0].astype(jnp.float32), eh_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bias += jax.lax.dot_general(
        rw_ref[0].astype(jnp.float32), ew_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rt_ref is not None:
        bias += jax.lax.dot_general(
            rt_ref[0].astype(jnp.float32), et_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    s = s + bias + mask_ref[:]

    # Row-wise softmax over the full (padded) key axis.
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _attn_pallas_fwd_impl(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls,
                          tile_q=512):
    """q [BH, Nq, D], k/v [BH, Nk, D], rh [BH, Nq, KH], ... -> [BH, Nq, D]."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    nq_pad = _round_up(nq, tile_q)
    nk_pad = _round_up(nk, 128)

    qp = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    rhp = jnp.pad(rh, ((0, 0), (0, nq_pad - nq), (0, 0)))
    rwp = jnp.pad(rw, ((0, 0), (0, nq_pad - nq), (0, 0)))
    inputs = [qp, kp, vp, rhp, rwp]
    in_specs = [
        pl.BlockSpec((1, tile_q, d), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk_pad, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk_pad, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_q, rh.shape[-1]), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_q, rw.shape[-1]), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    Eh, Ew, Et, mask = _expansion_matrices(
        kt, kh, kw, nk, nk_pad, has_cls, with_rt=rt is not None
    )

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda b, i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if rt is not None:
        rtp = jnp.pad(rt, ((0, 0), (0, nq_pad - nq), (0, 0)))
        inputs.append(rtp)
        in_specs.append(
            pl.BlockSpec((1, tile_q, rt.shape[-1]), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs += [jnp.asarray(Eh), jnp.asarray(Ew), jnp.asarray(Et),
                   jnp.asarray(mask)]
        in_specs += [full_spec(Eh.shape), full_spec(Ew.shape),
                     full_spec(Et.shape), full_spec(mask.shape)]
        kernel = functools.partial(_attn_kernel, scale=scale)
    else:
        inputs += [jnp.asarray(Eh), jnp.asarray(Ew), jnp.asarray(mask)]
        in_specs += [full_spec(Eh.shape), full_spec(Ew.shape),
                     full_spec(mask.shape)]

        def kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref,
                   eh_ref, ew_ref, mask_ref, o_ref):
            _attn_kernel(
                q_ref, k_ref, v_ref, rh_ref, rw_ref, None,
                eh_ref, ew_ref, None, mask_ref, o_ref, scale=scale,
            )

    out = pl.pallas_call(
        kernel,
        grid=(bh, nq_pad // tile_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nq_pad * nk_pad * d,
            bytes_accessed=(2 * bh * nq_pad * d + 2 * bh * nk_pad * d) * 2,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(*inputs)
    return out[:, :nq]


def _reference_attention(q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls):
    """XLA reference (used by the custom_vjp backward recompute)."""
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

    def ref(q, k, v, rh, rw, rt):
        return _reference_attention(
            q, k, v, rh, rw, rt, scale, kt, kh, kw, has_cls
        )

    if rt is None:
        _, vjp = jax.vjp(lambda a, b, c, d, e: ref(a, b, c, d, e, None),
                         q, k, v, rh, rw)
        dq, dk, dv, drh, drw = vjp(g)
        return dq, dk, dv, drh, drw, None
    _, vjp = jax.vjp(ref, q, k, v, rh, rw, rt)
    return vjp(g)


fused_rel_attention.defvjp(_fwd, _bwd)
