"""Fused sparse-KV projection + pool + group-LN Pallas kernel (round 4).

The MViT K/V path at disjoint-window strides (stride >= kernel spatially —
blocks 0-2 of MViTv2-S; reference math `MViT/slowfast/models/attention.py:
202-284`) currently lowers to ~60 small XLA ops per block: the K and V
projection dots over the decimated token set, 27 unrolled strided-slice
FMAs per tensor for the pooling conv, the padding-tap bias correction, and
the FlatGroupLN stats dots. The bytes are trivial (a few MB per block);
the cost is op-dispatch and fusion fragmentation (tools/profile_step.py:
pool_k/v slices 2.2 ms + squeezes 1.1 + grad adds 1.5 + LN share ~2 at
bs 8).

This kernel does the whole K/V half in ONE VMEM-resident pass per batch
row: load the decimated tokens, project with the k and v weight slices on
the MXU, accumulate the 3x3x3 taps, add the valid-tap bias term, compute
per-head LN stats with 0/1 masked matmuls (f32 accumulation, same rounding
class as FlatGroupLN), and write normalized K and V.

The backward is a custom_vjp expressed in compact XLA einsums (3 shifted
adds over the temporal taps instead of 27 slice gradients); residuals are
the pre-LN pooled activations (small) — the projections are never stored.

Forward-only exactness vs the unfused path is asserted in
tests/test_kv_pool_pallas.py (interpret mode on CPU, both dtypes).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _valid_taps(T_in, H_in, W_in, kernel, stride):
    """kvalid [T_out, kt, Ph, kh, Pw, kw] float32 1/0: taps inside the
    un-padded grid (the projection-bias contribution mask; AttentionPool's
    `invalid` complement)."""
    kt, kh, kw = kernel
    _, sh, sw = stride
    pt, ph, pw = kt // 2, kh // 2, kw // 2
    Ph = (H_in + 2 * ph - kh) // sh + 1
    Pw = (W_in + 2 * pw - kw) // sw + 1
    Tp = T_in + 2 * pt
    T_out = Tp - 2 * pt
    valid_t = ((np.arange(Tp) - pt) >= 0) & ((np.arange(Tp) - pt) < T_in)
    h_idx = sh * np.arange(Ph)[:, None] + np.arange(kh)[None, :] - ph
    w_idx = sw * np.arange(Pw)[:, None] + np.arange(kw)[None, :] - pw
    valid = (
        valid_t[:, None, None, None, None]
        & ((h_idx >= 0) & (h_idx < H_in))[None, :, :, None, None]
        & ((w_idx >= 0) & (w_idx < W_in))[None, None, None, :, :]
    )  # [Tp, Ph, kh, Pw, kw]
    out = np.stack(
        [valid[dt : dt + T_out] for dt in range(kt)], axis=1
    )  # [T_out, kt, Ph, kh, Pw, kw]
    return out.astype(np.float32), (T_out, Ph, Pw)


def _kernel(
    z_ref, wk_ref, wv_ref, wrk_ref, wrv_ref, m01_ref, bterm_ref,
    lnk_ref, lnv_ref, mj_ref, mt_ref, k_out, v_out,
    *, kt, Ph, Pw, T_out, S_sp, C_in, HC, heads, eps, compute_dtype,
):
    """One batch row: z [Tp, S_sp, C_in] -> k,v [T_out, Ph*Pw, HC].

    2-D-only formulation (Mosaic-friendly; the first version's 6-d tap
    slices crashed the remote compile helper): the depthwise pooling is
    pooled[t] = sum_dt M01 @ (proj[t+dt] * Wrow[dt]) with
    - Wrow [kt, S_sp, HC]: per-decimated-row tap weight (w[dt, i(s), j(s), c]),
    - M01 [Ph*Pw, S_sp]: 0/1 window-membership matrix (9 ones per row).
    bterm [2, T_out, Ph*Pw, HC]: bias * valid-tap-kernel-sum. lnk/lnv
    [2, HC]: tiled LN affine. mj/mt: FlatGroupLN stats matmuls.
    """
    mj = mj_ref[:]
    mt = mt_ref[:]
    m01 = m01_ref[:]

    def one(w_ref, wr_ref, b_idx, ln_ref, out_ref):
        w = w_ref[:].astype(compute_dtype)           # [C_in, HC]
        for t in range(T_out):
            acc = jnp.zeros((Ph * Pw, HC), jnp.float32)
            for dt in range(kt):
                zt = z_ref[0, t + dt].astype(compute_dtype)  # [S_sp, C_in]
                proj = jax.lax.dot_general(
                    zt, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [S_sp, HC]
                acc = acc + jax.lax.dot_general(
                    m01, proj * wr_ref[dt], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            pooled = acc + bterm_ref[b_idx, t]
            # Group LN over C within each head block. heads == 1 is a plain
            # row LayerNorm (VPU reduction; lane-width-1 matmuls are the
            # prime suspect for the block-0 Mosaic crash).
            if heads == 1:
                mean_f = jnp.mean(pooled, axis=-1, keepdims=True)
                var1 = jnp.mean(pooled * pooled, axis=-1, keepdims=True)
                inv_f = jax.lax.rsqrt(var1 - mean_f * mean_f + eps)
            else:
                mean = jax.lax.dot_general(
                    pooled, mj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [P, heads]
                var = jax.lax.dot_general(
                    pooled * pooled, mj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) - mean * mean
                mean_f = jax.lax.dot_general(
                    mean, mt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                inv_f = jax.lax.dot_general(
                    jax.lax.rsqrt(var + eps), mt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            y = (pooled - mean_f) * inv_f * ln_ref[0] + ln_ref[1]
            out_ref[0, t] = y.astype(out_ref.dtype)

    one(wk_ref, wrk_ref, 0, lnk_ref[:], k_out)
    one(wv_ref, wrv_ref, 1, lnv_ref[:], v_out)


def fused_kv_pool_fwd_only(
    z, wk, wv, bk, bv, pk, pv, ln_k, ln_v,
    *, grid_thw, kernel, stride, heads, eps, compute_dtype, out_dtype,
    interpret=False,
):
    """z: [B, Tp, S_sp, C_in] decimated tokens ((Ph,kh,Pw,kw) spatial order,
    decimate_pool_windows layout). wk/wv: [C_in, HC] projection slices.
    bk/bv: [HC] or None. pk/pv: [kt,kh,kw,C] depthwise pool params (per-head
    shared). ln_k/ln_v: (scale [C], bias [C]). Returns k, v [B, T_out,
    Ph*Pw, HC] normalized pooled tokens (no cls row)."""
    B, Tp, S_sp, C_in = z.shape
    T_in, H_in, W_in = grid_thw
    kt, kh, kw = kernel
    HC = wk.shape[1]
    C = HC // heads
    kvalid, (T_out, Ph, Pw) = _valid_taps(T_in, H_in, W_in, kernel, stride)
    assert S_sp == Ph * kh * Pw * kw, (S_sp, Ph, kh, Pw, kw)

    def tile(p):
        return jnp.tile(p.reshape(kt, kh, kw, C), (1, 1, 1, heads))

    pk_t, pv_t = tile(pk), tile(pv)
    # bias * (sum of kernel taps at VALID positions): [2, T_out, Ph*Pw, HC].
    bterm = jnp.zeros((2, T_out, Ph * Pw, HC), jnp.float32)
    if bk is not None:
        kv = jnp.asarray(
            kvalid.reshape(T_out, kt, Ph, kh, Pw, kw, 1)
        )
        for idx, (b_sl, p_t) in enumerate(((bk, pk_t), (bv, pv_t))):
            ksum = jnp.einsum(
                "tdpiqjx,dijc->tpqc", kv, p_t.astype(jnp.float32)
            ).reshape(T_out, Ph * Pw, HC)
            bterm = bterm.at[idx].set(ksum * b_sl.astype(jnp.float32))

    lnk = jnp.stack(
        [jnp.tile(ln_k[0].astype(jnp.float32), heads),
         jnp.tile(ln_k[1].astype(jnp.float32), heads)]
    )
    lnv = jnp.stack(
        [jnp.tile(ln_v[0].astype(jnp.float32), heads),
         jnp.tile(ln_v[1].astype(jnp.float32), heads)]
    )

    # Per-row tap weights Wrow[dt, s=(p,i,q,j), c] = p_t[dt, i, j, c] and
    # the 0/1 window-membership matrix M01[(p,q), (p,i,q,j)] (the
    # decimated rows partition across windows, so M01 has one 1/column).
    def wrow(p_t):
        return jnp.broadcast_to(
            p_t.astype(jnp.float32)[:, None, :, None, :, :],
            (kt, Ph, kh, Pw, kw, HC),
        ).reshape(kt, S_sp, HC)

    m01_np = np.zeros((Ph * Pw, S_sp), np.float32)
    for p in range(Ph):
        for i in range(kh):
            for q in range(Pw):
                for j in range(kw):
                    m01_np[p * Pw + q, ((p * kh + i) * Pw + q) * kw + j] = 1.0

    kern = functools.partial(
        _kernel, kt=kt, Ph=Ph, Pw=Pw, T_out=T_out,
        S_sp=S_sp, C_in=C_in, HC=HC, heads=heads, eps=eps,
        compute_dtype=compute_dtype,
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, T_out, Ph * Pw, HC), out_dtype),
        jax.ShapeDtypeStruct((B, T_out, Ph * Pw, HC), out_dtype),
    ]
    bspec = lambda shp: pl.BlockSpec(shp, lambda b: (0,) * len(shp))  # noqa: E731
    k, v = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tp, S_sp, C_in), lambda b: (b, 0, 0, 0)),
            bspec((C_in, HC)),
            bspec((C_in, HC)),
            bspec((kt, S_sp, HC)),
            bspec((kt, S_sp, HC)),
            bspec((Ph * Pw, S_sp)),
            bspec((2, T_out, Ph * Pw, HC)),
            bspec((2, HC)),
            bspec((2, HC)),
            bspec((HC, heads)),
            bspec((heads, HC)),
        ],
        out_specs=[
            pl.BlockSpec((1, T_out, Ph * Pw, HC), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, T_out, Ph * Pw, HC), lambda b: (b, 0, 0, 0)),
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        z, wk.astype(compute_dtype), wv.astype(compute_dtype),
        wrow(pk_t), wrow(pv_t), jnp.asarray(m01_np), bterm, lnk, lnv,
        jnp.asarray(
            np.kron(np.eye(heads, dtype=np.float32),
                    np.ones((C, 1), np.float32)) / C
        ),
        jnp.asarray(
            np.kron(np.eye(heads, dtype=np.float32),
                    np.ones((1, C), np.float32))
        ),
    )
    return k, v


def _ln_rows(pooled, scale_t, bias_t, heads, eps):
    """FlatGroupLN forward on [..., HC] f32 pooled rows (tiled affine)."""
    HC = pooled.shape[-1]
    C = HC // heads
    m01 = np.kron(np.eye(heads, dtype=np.float32), np.ones((C, 1), np.float32))
    mj = jnp.asarray(m01 / C)
    mt = jnp.asarray(m01.T)
    mean = pooled @ mj
    var = (pooled * pooled) @ mj - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    return (pooled - mean @ mt) * (inv @ mt) * scale_t + bias_t


def _ln_rows_bwd(pooled, gy, scale_t, heads, eps):
    """Standard LN backward on pooled rows; returns (g_pooled, dscale_t,
    dbias_t) with the tiled-affine grads summed over all leading axes."""
    HC = pooled.shape[-1]
    C = HC // heads
    m01 = np.kron(np.eye(heads, dtype=np.float32), np.ones((C, 1), np.float32))
    mj = jnp.asarray(m01 / C)
    mt = jnp.asarray(m01.T)
    mean = pooled @ mj
    var = (pooled * pooled) @ mj - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    inv_f = inv @ mt
    xhat = (pooled - mean @ mt) * inv_f
    gs = gy * scale_t
    m1 = (gs @ mj) @ mt
    m2 = ((gs * xhat) @ mj) @ mt
    g_pooled = (gs - m1 - xhat * m2) * inv_f
    axes = tuple(range(pooled.ndim - 1))
    return g_pooled, jnp.sum(gy * xhat, axis=axes), jnp.sum(gy, axis=axes)


def make_fused_kv_pool(
    *, grid_thw, kernel, stride, heads, eps, compute_dtype, out_dtype,
    has_bias, use_pallas=True, interpret=False,
):
    """Returns fused_kv(z, params) -> (k, v) with a hand-written VJP.

    z: [B, Tp, S_sp, C_in] decimated tokens. params: dict with
    wk/wv [C_in, HC], bk/bv [HC] (absent when has_bias=False),
    pk/pv [kt,kh,kw,1,C], sk/bk_ln/sv/bv_ln [C].
    Outputs: k, v [B, T_out, Ph*Pw, HC] pooled+normalized (no cls row).

    Forward runs the Pallas kernel (TPU); backward is compact XLA einsums
    (3 shifted tap-adds instead of 27 slice gradients; LN gradient via the
    masked-matmul trick; projections recomputed, never stored).
    """
    T_in, H_in, W_in = grid_thw
    kt, kh, kw = kernel
    kvalid_np, (T_out, Ph, Pw) = _valid_taps(
        T_in, H_in, W_in, kernel, stride
    )
    kvalid7 = jnp.asarray(
        kvalid_np.reshape(T_out, kt, Ph, kh, Pw, kw, 1)
    )

    def tile_p(p, HC):
        C = HC // heads
        return jnp.tile(p.reshape(kt, kh, kw, C), (1, 1, 1, heads))

    def tile_c(v, HC):
        return jnp.tile(v.astype(jnp.float32), heads)

    def fwd_math(z, params):
        """XLA fallback / reference forward."""
        HC = params["wk"].shape[1]
        outs = []
        for t in ("k", "v"):
            p_t = tile_p(params[f"p{t}"], HC)
            pooled = pooled_pre_ln(
                z, params[f"w{t}"], params.get(f"b{t}"), p_t, kvalid_np,
                (T_out, Ph, Pw), kernel, compute_dtype,
            ).reshape(z.shape[0], T_out, Ph * Pw, HC)
            y = _ln_rows(
                pooled, tile_c(params[f"s{t}"], HC),
                tile_c(params[f"b{t}_ln"], HC), heads, eps,
            )
            outs.append(y.astype(out_dtype))
        return tuple(outs)

    def vmem_estimate_bytes(z, HC):
        """Static VMEM footprint of the kernel's resident blocks. The v2
        kernel at block-1 geometry (~19 MB) WEDGED the TPU worker (hung
        past SIGTERM, round-2 failure class) — geometries whose blocks
        don't comfortably fit VMEM take the XLA forward instead."""
        B, Tp, S_sp, C_in = z.shape
        bpe = 2 if z.dtype == jnp.bfloat16 else 4
        z_b = Tp * S_sp * C_in * bpe
        wrow_b = 2 * kt * S_sp * HC * 4
        m01_b = Ph * Pw * S_sp * 4
        bterm_b = 2 * T_out * Ph * Pw * HC * 4
        out_b = 2 * T_out * Ph * Pw * HC * bpe
        work_b = 2 * S_sp * HC * 4  # proj + acc working tiles
        return z_b + wrow_b + m01_b + bterm_b + out_b + work_b

    def fwd_kernel(z, params):
        return fused_kv_pool_fwd_only(
            z, params["wk"], params["wv"],
            params.get("bk"), params.get("bv"),
            params["pk"], params["pv"],
            (params["sk"], params["bk_ln"]),
            (params["sv"], params["bv_ln"]),
            grid_thw=grid_thw, kernel=kernel, stride=stride, heads=heads,
            eps=eps, compute_dtype=compute_dtype, out_dtype=out_dtype,
            interpret=interpret,
        )

    @jax.custom_vjp
    def fused_kv(z, params):
        if use_pallas and vmem_estimate_bytes(
            z, params["wk"].shape[1]
        ) <= 10 * 1024 * 1024:
            return fwd_kernel(z, params)
        return fwd_math(z, params)

    def fwd(z, params):
        out = fused_kv(z, params)
        return out, (z, params)

    def bwd(res, g):
        z, params = res
        gk, gv = g
        B = z.shape[0]
        HC = params["wk"].shape[1]
        C = HC // heads
        gz_total = jnp.zeros(z.shape, jnp.float32)
        grads = {}
        for t, gy in (("k", gk), ("v", gv)):
            w = params[f"w{t}"]
            b = params.get(f"b{t}")
            p_t = tile_p(params[f"p{t}"], HC)
            ptf = p_t.astype(jnp.float32)
            # Recompute projections + pooled pre-LN rows.
            proj = jnp.einsum(
                "btsc,cd->btsd", z.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ).reshape(B, -1, Ph, kh, Pw, kw, HC)
            acc = jnp.zeros((B, T_out, Ph, Pw, HC), jnp.float32)
            for dt in range(kt):
                for i in range(kh):
                    for j in range(kw):
                        acc = acc + (
                            proj[:, dt : dt + T_out, :, i, :, j, :]
                            * ptf[dt, i, j]
                        )
            ksum = jnp.einsum(
                "tdpiqjx,dijc->tpqc", kvalid7, ptf
            )  # [T_out, Ph, Pw, HC]
            pooled = acc
            if b is not None:
                pooled = pooled + ksum[None] * b.astype(jnp.float32)
            pooled = pooled.reshape(B, T_out, Ph * Pw, HC)

            g_pooled, ds_t, db_t = _ln_rows_bwd(
                pooled, gy.astype(jnp.float32),
                tile_c(params[f"s{t}"], HC), heads, eps,
            )
            grads[f"s{t}"] = ds_t.reshape(heads, C).sum(0)
            grads[f"b{t}_ln"] = db_t.reshape(heads, C).sum(0)
            gp4 = g_pooled.reshape(B, T_out, Ph, Pw, HC)
            if b is not None:
                grads[f"b{t}"] = jnp.einsum("btpqc,tpqc->c", gp4, ksum)
            # Pool-kernel grad: conv taps + bias-leak term.
            gpk = jnp.stack(
                [
                    jnp.einsum(
                        "btpiqjc,btpqc->ijc",
                        proj[:, dt : dt + T_out], gp4,
                    )
                    for dt in range(kt)
                ]
            )  # [kt, kh, kw, HC]
            if b is not None:
                gpk = gpk + jnp.einsum(
                    "tdpiqjx,btpqc->dijc", kvalid7, gp4
                ) * b.astype(jnp.float32)
            grads[f"p{t}"] = (
                gpk.reshape(kt, kh, kw, heads, C).sum(3, keepdims=True)
            )
            # Tap-scatter back to the projection grid: kt shifted
            # outer-product adds (not 27 slice grads).
            gproj = jnp.zeros(
                (B, z.shape[1], Ph, kh, Pw, kw, HC), jnp.float32
            )
            for dt in range(kt):
                term = jnp.einsum("btpqc,ijc->btpiqjc", gp4, ptf[dt])
                gproj = gproj.at[:, dt : dt + T_out].add(term)
            gproj2 = gproj.reshape(B, -1, HC)
            zf = z.reshape(-1, z.shape[-1]).astype(compute_dtype)
            grads[f"w{t}"] = jnp.einsum(
                "mc,md->cd", zf,
                gproj2.reshape(-1, HC).astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ).astype(params[f"w{t}"].dtype)
            gz_total = gz_total + jnp.einsum(
                "bmd,cd->bmc",
                gproj2.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ).reshape(z.shape)
        # dtype-match the param tree.
        grads = {
            k_: grads[k_].astype(params[k_].dtype) if k_ in grads else None
            for k_ in params
        }
        grads = {k_: v_ for k_, v_ in grads.items() if v_ is not None}
        # custom_vjp needs the full pytree structure of `params`.
        full = {k_: grads.get(k_, jnp.zeros_like(v_))
                for k_, v_ in params.items()}
        return gz_total.astype(z.dtype), full

    fused_kv.defvjp(fwd, bwd)
    return fused_kv, (T_out, Ph, Pw)


def pooled_pre_ln(z, w, b, p_t, kvalid, grid, kernel, compute_dtype):
    """XLA reference/backward helper: pooled pre-LN activations from
    decimated tokens. z [B, Tp, S_sp, C_in], w [C_in, HC], p_t tiled
    [kt,kh,kw,HC]. Returns [B, T_out, Ph*Pw, HC] f32."""
    T_out, Ph, Pw = grid
    kt, kh, kw = kernel
    B, Tp, S_sp, C_in = z.shape
    HC = w.shape[1]
    proj = jnp.einsum(
        "btsc,cd->btsd", z.astype(compute_dtype), w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(B, Tp, Ph, kh, Pw, kw, HC)
    acc = jnp.zeros((B, T_out, Ph, Pw, HC), jnp.float32)
    for dt in range(kt):
        for i in range(kh):
            for j in range(kw):
                acc = acc + (
                    proj[:, dt : dt + T_out, :, i, :, j, :]
                    * p_t.astype(jnp.float32)[dt, i, j]
                )
    pooled = acc.reshape(B, T_out, Ph * Pw, HC)
    if b is not None:
        ksum = jnp.einsum(
            "tdpiqjx,dijc->tpqc",
            jnp.asarray(kvalid.reshape(T_out, kt, Ph, kh, Pw, kw, 1)),
            p_t.astype(jnp.float32),
        ).reshape(T_out, Ph * Pw, HC)
        pooled = pooled + ksum * b.astype(jnp.float32)
    return pooled
