"""Pallas TPU kernel: fused transformer MLP half-block with residual.

Computes  y = x + dp * (gelu(ln(x) @ W1 + b1) @ W2 + b2)  — the
[norm2 -> Mlp -> drop-path -> residual] tail of a transformer block
(`MViT/slowfast/models/attention.py:464-589` MultiScaleBlock, re-designed
TPU-first) — in ONE pass over x, with a flash-style recompute backward.

Why: the train step is HBM-bound (ROADMAP roofline account). The XLA
lowering writes + re-reads the [N, 4C] hidden activation and the LN output
three times across fwd/bwd (~154 MB per stage-1 block at bs 8); here they
live only in VMEM. HBM traffic becomes exactly
  fwd:  read x, write y
  bwd:  read x, read dy, write dx
plus the (tiny) weights; dW1/dW2/dLN grads accumulate in f32 VMEM
scratch across the whole (batch, tile) grid and are written once.

Layout contract: x, dy, y, dx are [B, N, C] tokens-major blocks tiled over
N; weights ride along as full blocks (re-DMA'd only on first use); the
per-sample drop-path multiplier dp is an SMEM scalar. Tail rows beyond N
are masked on load in the backward so garbage cannot reach the weight-grad
accumulators (forward tail writes are dropped by Mosaic's bounds masking).

Numerics match the unfused path: LN statistics in f32, matmuls bf16 with
f32 accumulation then downcast (the nn.Dense convention), tanh-approx gelu
(flax nn.gelu default).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests force interpreter mode off-TPU.
INTERPRET_OVERRIDE: Optional[bool] = None

# See ops/attn_block_pallas._COMPILER_PARAMS: XLA may stack VMEM-pinned
# kernel outputs on the scoped allocation inside large modules.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _interpret():
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_tile(n, c, hidden):
    """Q-row tile size against the [tile, hidden] temporaries (VMEM)."""
    if hidden <= 512:
        target = 1024
    elif hidden <= 1024:
        target = 512
    else:
        # hidden=1536 (C=384): the f32 dW1/dW2 accumulators already hold
        # 4.7 MB; keep the [tile, hidden] temporaries small.
        target = 128
    ntiles = max(1, -(-n // target))
    return _round_up(-(-n // ntiles), 16), ntiles


def fits_vmem(c, hidden):
    """The backward keeps dW1/dW2 (f32) + W1/W2 (bf16) resident: 12*c*hidden
    bytes no tile size can shrink. Gate generously below the 16 MB scoped
    limit (stage-4 blocks at C=768, hidden=3072 would need 27 MB)."""
    return 12 * c * hidden <= 10 * 1024 * 1024


def _gelu_grad(x):
    """d/dx of tanh-approx gelu (jax.nn.gelu approximate=True), f32."""
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    a = 0.044715
    u = c * (x + a * x * x * x)
    t = jnp.tanh(u)
    du = c * (1.0 + 3.0 * a * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _ln_f32(x32, scale, bias, eps):
    mu = jnp.mean(x32, axis=1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * scale + bias, xhat, rstd


def _fwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                dp_ref, y_ref, *, eps):
    xt = x_ref[0]
    dt = xt.dtype
    dp_b = dp_ref[pl.program_id(0), 0]
    ln, _, _ = _ln_f32(
        xt.astype(jnp.float32), s_ref[0], b_ref[0], eps
    )
    h = jax.lax.dot_general(
        ln.astype(dt), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b1_ref[0]
    g = jax.nn.gelu(h)
    yb = jax.lax.dot_general(
        g, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b2_ref[0]
    y_ref[0] = xt + dp_b.astype(dt) * yb


def _bwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                dp_ref, dy_ref,
                dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, eps, n, tile_n):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0) + i * tile_n
    ) < n

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    xt = jnp.where(row_ok, x_ref[0], 0)
    dy = jnp.where(row_ok, dy_ref[0], 0)
    dt = xt.dtype
    scale = s_ref[0]
    dp = dp_ref[bi, 0]

    # --- recompute forward (VMEM only)
    ln32, xhat, rstd = _ln_f32(xt.astype(jnp.float32), scale, b_ref[0], eps)
    ln = ln32.astype(dt)
    h = jax.lax.dot_general(
        ln, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b1_ref[0]
    g = jax.nn.gelu(h)

    # --- backward
    dyb = (dy.astype(jnp.float32) * dp).astype(dt)

    dw2_ref[...] += jax.lax.dot_general(
        g, dyb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(dyb.astype(jnp.float32), axis=0, keepdims=True)
    dg = jax.lax.dot_general(
        dyb, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = (dg * _gelu_grad(h.astype(jnp.float32))).astype(dt)
    dw1_ref[...] += jax.lax.dot_general(
        ln, dh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dln = jax.lax.dot_general(
        dh, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # f32 [T, C]
    ds_ref[...] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * scale
    c = xt.shape[-1]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = (dy.astype(jnp.float32) + dx_ln).astype(dt)


def _mlp_call(x, ln_s, ln_b, w1, b1, w2, b2, dp, eps):
    bsz, n, c = x.shape
    hidden = w1.shape[1]
    tile_n, ntiles = _pick_tile(n, c, hidden)
    dt = x.dtype

    row = lambda last: pl.BlockSpec(
        (1, tile_n, last), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM
    )
    fixed = lambda shape: pl.BlockSpec(
        shape, lambda b_, i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    # SMEM blocks must cover the array (per-b (1,1) blocks violate the
    # (8,128)-divisibility rule): pass the whole [B,1] vector and index by
    # program_id inside the kernel.
    dp_spec = pl.BlockSpec(
        (bsz, 1), lambda b_, i: (0, 0), memory_space=pltpu.SMEM
    )
    in_specs = [
        row(c),            # x
        fixed((1, c)),     # ln scale (f32)
        fixed((1, c)),     # ln bias (f32)
        fixed((c, hidden)),
        fixed((1, hidden)),
        fixed((hidden, c)),
        fixed((1, c)),
        dp_spec,
    ]
    args = (
        x,
        ln_s.reshape(1, c).astype(jnp.float32),
        ln_b.reshape(1, c).astype(jnp.float32),
        w1.astype(dt), b1.reshape(1, hidden).astype(dt),
        w2.astype(dt), b2.reshape(1, c).astype(dt),
        dp.reshape(bsz, 1).astype(jnp.float32),
    )
    return bsz, n, c, hidden, tile_n, ntiles, in_specs, args, row, fixed


def _fwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, dp, eps):
    bsz, n, c, hidden, tile_n, ntiles, in_specs, args, row, fixed = _mlp_call(
        x, ln_s, ln_b, w1, b1, w2, b2, dp, eps
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(bsz, ntiles),
        in_specs=in_specs,
        out_specs=row(c),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * n * c * hidden,
            bytes_accessed=2 * 2 * bsz * n * c + 4 * c * hidden,
            transcendentals=bsz * n * hidden,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*args)


def _bwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, dp, dy, eps):
    bsz, n, c, hidden, tile_n, ntiles, in_specs, args, row, fixed = _mlp_call(
        x, ln_s, ln_b, w1, b1, w2, b2, dp, eps
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n=n, tile_n=tile_n),
        grid=(bsz, ntiles),
        in_specs=in_specs + [row(c)],  # dy
        out_specs=[
            row(c),                    # dx
            fixed((1, c)),             # dscale
            fixed((1, c)),             # dbias
            fixed((c, hidden)),        # dw1
            fixed((1, hidden)),        # db1
            fixed((hidden, c)),        # dw2
            fixed((1, c)),             # db2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * bsz * n * c * hidden,
            bytes_accessed=3 * 2 * bsz * n * c + 12 * c * hidden,
            transcendentals=2 * bsz * n * hidden,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*(args + (dy,)))
    dx, dscale, dbias, dw1, db1, dw2, db2 = outs
    return (
        dx,
        dscale.reshape(ln_s.shape).astype(ln_s.dtype),
        dbias.reshape(ln_b.shape).astype(ln_b.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        # dp is a drop-path mask (no parameters behind it): its cotangent
        # is never consumed, so the kernel does not compute it.
        jnp.zeros_like(dp),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_mlp_residual(x, ln_s, ln_b, w1, b1, w2, b2, dp, eps=1e-6):
    """y = x + dp[:, None, None] * (gelu(ln(x) @ w1 + b1) @ w2 + b2).

    x [B, N, C]; dp [B] per-sample drop-path multiplier (1.0 when off).
    """
    return _fwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, dp, eps)


def _vjp_fwd(x, ln_s, ln_b, w1, b1, w2, b2, dp, eps):
    y = _fwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, dp, eps)
    return y, (x, ln_s, ln_b, w1, b1, w2, b2, dp)


def _vjp_bwd(eps, res, dy):
    x, ln_s, ln_b, w1, b1, w2, b2, dp = res
    return _bwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, dp, dy, eps)


fused_mlp_residual.defvjp(_vjp_fwd, _vjp_bwd)
