"""MViT pooling attention with decomposed relative position biases.

TPU-first re-design of the reference MultiScaleAttention / MultiScaleBlock
(`MViT/slowfast/models/attention.py`). Differences from the CUDA/torch
implementation, by design:

- channels-last token grids; pooling convs run as depthwise NDHWC convs that
  XLA maps directly onto TPU conv units.
- rel-pos tables are interpolated at *trace time* to static (q,k) extents —
  there is no data-dependent shape anywhere, so each (thw, pooling) pair
  compiles once.
- the portrait/landscape `hw_switch` (`attention.py:414-435`) is a static
  trace flag: the portrait specialization swaps the H/W tables, giving an
  exactly-equivalent program to the reference's per-sample branch.
- attention itself is a dense bf16 QK^T -> +bias -> softmax -> @V with the
  rel-pos bias folded into the QK^T matmul via a 0/1 expansion matrix, and
  an optional q-chunked lowering (ATTN_Q_CHUNK) that keeps the [Nq, Nk]
  probs tensor from ever being materialized whole. Hand-written Pallas
  attention/MLP kernels were built and measured across rounds 1-3 and LOST
  to this XLA path end-to-end at every gating (pallas_call is a fusion
  barrier; see ROADMAP.md dead-end ledger) — the XLA lowering IS the
  production path by measurement, not by default.
"""

import functools
import logging
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.common import DropPath, Mlp, max_pool_3d, avg_pool_3d, trunc_normal_init

# One-shot (per process) notice that FLAT_POOLS fell back on batch size.
_FLAT_FALLBACK_WARNED = []

_DIAG_SKIP_POOL_LN = False  # diagnostic only
# Diagnostics (wrong math, timing only — tools/ablate.py): price the
# attention core (scores+softmax+@v+rel-pos) / the MLP branch inside the
# full step by replacing them with shape-preserving identities.
_DIAG_ATTENTION_IDENTITY = False
_DIAG_SKIP_MLP = False
_DIAG_SKIP_ATTN_BRANCH = False  # whole MultiScaleAttention module -> zeros


class FusedQKVSplitDots(nn.Module):
    """Fused-qkv projection computed as three dots on weight slices.

    Parameter layout is identical to ``nn.Dense(3 * dim_out)`` (one
    ``kernel``/``bias`` pair, checkpoint- and importer-compatible with the
    reference's fused qkv linear, `attention.py:202-207`), but the output
    is produced per-head-group: ``x @ W[:, i*D:(i+1)*D]`` is bit-exactly
    ``(x @ W)[..., i*D:(i+1)*D]``, and slicing the *weight* (a few KB) is
    free while slicing the [B, N, 3, H, C] activation costs a 100-230 MB
    strided copy per block at stage-1 sizes — plus a pad+add-any pair in
    the gradient (measured via tools/hlo_rank.py; the step is HBM-bound).
    """

    dim_out: int
    num_heads: int
    use_bias: bool = False
    kernel_init: Any = None  # default trunc_normal_init(0.02)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, flat=False):
        """x: [B, N, C] tokens for the Q slice. When ``kv`` is given (the
        sparse-KV-pool path), the K/V slices project ``kv`` — a decimated
        token set [B, M, C] — instead of x; weights are unchanged, so this
        is exactly the reference projection restricted to the tokens the
        strided pooling conv actually reads."""
        B, N, in_dim = x.shape
        kernel = self.param(
            "kernel",
            self.kernel_init or trunc_normal_init(0.02),
            (in_dim, 3 * self.dim_out),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (3 * self.dim_out,))
            if self.use_bias
            else None
        )
        x, kv, kernel, bias = nn.dtypes.promote_dtype(
            x, kv, kernel, bias, dtype=self.dtype
        )
        outs = []
        slices = []
        for i, src in enumerate((x, kv, kv) if kv is not None else (x, x, x)):
            w = jax.lax.slice_in_dim(
                kernel, i * self.dim_out, (i + 1) * self.dim_out, axis=1
            )
            y = jnp.dot(src, w)
            b_i = None
            if bias is not None:
                b_i = jax.lax.slice_in_dim(
                    bias, i * self.dim_out, (i + 1) * self.dim_out, axis=0
                )
                y = y + b_i
            slices.append(b_i)
            outs.append(
                y if flat else y.reshape(B, src.shape[1], self.num_heads, -1)
            )
        if kv is not None:
            # Sparse-KV callers need the K/V bias slices to correct the
            # padding-tap bias leak after pooling (AttentionPool).
            return outs[0], outs[1], outs[2], (slices[1], slices[2])
        return outs


def chunked_attention(q_ext, k_ext, v, chunk, remat=True):
    """Q-tiled attention: per q-chunk scores -> softmax -> @V.

    Same math as the single extended matmul (softmax rows are independent),
    but the [Nq, Nk] probs tensor is never materialized whole: the largest
    live buffer is [B, H, chunk, Nk]. With ``remat`` each chunk's probs are
    recomputed in the backward instead of being stored fwd->bwd, which
    removes the stage-1/2 probs buffers (315 MB at block1, bs 8) from the
    residual set — the buffer that broke bs-64 compiles (int32 element
    limit) and the single largest HBM-traffic item in the per-op profile.

    Chunks are an unrolled Python loop over static slices (not lax.scan):
    slices along the token axis need no relayout of q_ext, the ragged tail
    chunk needs no padding, and XLA can software-pipeline chunk i+1's QK^T
    against chunk i's @V.
    """

    def body(qc, ke, vv):
        s = jnp.einsum("bqhc,bkhc->bhqk", qc, ke)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhc->bqhc", p, vv)

    f = jax.checkpoint(body) if remat else body
    nq = q_ext.shape[1]
    outs = []
    for i in range(0, nq, chunk):
        qc = jax.lax.slice_in_dim(q_ext, i, min(i + chunk, nq), axis=1)
        outs.append(f(qc, k_ext, v))
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=1)


def interpolate_rel_pos(rel_pos, d):
    """Linear-resize a [L, C] rel-pos table to [d, C].

    Matches torch F.interpolate(mode='linear', align_corners=False)
    (`attention.py:51-64`); static shapes, so it folds into the jitted graph.
    """
    L = rel_pos.shape[0]
    if L == d:
        return rel_pos
    return jax.image.resize(rel_pos, (d, rel_pos.shape[1]), method="linear")


def rel_q_tables_spatial(q, q_shape, k_shape, rel_pos_h, rel_pos_w, has_cls_embed):
    """Per-query-row spatial rel-pos tables (rel_h_q, rel_w_q).

    q: [B, Nq, heads, C] (tokens-major, heads folded next to channels — the
    module's transpose-free layout). Returns ([B, q_n, heads, k_h],
    [B, q_n, heads, k_w]) for the token rows (cls excluded). Matches
    `attention.py:67-117` up to the bias expansion.
    """
    sp_idx = 1 if has_cls_embed else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    dh = int(2 * max(q_h, k_h) - 1)
    dw = int(2 * max(q_w, k_w) - 1)

    q_h_ratio = max(k_h / q_h, 1.0)
    k_h_ratio = max(q_h / k_h, 1.0)
    dist_h = (
        np.arange(q_h)[:, None] * q_h_ratio - np.arange(k_h)[None, :] * k_h_ratio
    )
    dist_h += (k_h - 1) * k_h_ratio
    q_w_ratio = max(k_w / q_w, 1.0)
    k_w_ratio = max(q_w / k_w, 1.0)
    dist_w = (
        np.arange(q_w)[:, None] * q_w_ratio - np.arange(k_w)[None, :] * k_w_ratio
    )
    dist_w += (k_w - 1) * k_w_ratio

    Rh = interpolate_rel_pos(rel_pos_h, dh)[dist_h.astype(np.int64)]  # [qh, kh, C]
    Rw = interpolate_rel_pos(rel_pos_w, dw)[dist_w.astype(np.int64)]  # [qw, kw, C]

    B, _, n_head, dim = q.shape
    r_q = q[:, sp_idx:].reshape(B, q_t, q_h, q_w, n_head, dim)
    rel_h_q = jnp.einsum("bthwyc,hkc->bthwyk", r_q, Rh.astype(q.dtype))
    rel_w_q = jnp.einsum("bthwyc,wkc->bthwyk", r_q, Rw.astype(q.dtype))
    q_n = q_t * q_h * q_w
    return (
        rel_h_q.reshape(B, q_n, n_head, k_h),
        rel_w_q.reshape(B, q_n, n_head, k_w),
    )


def rel_q_table_temporal(q, q_shape, k_shape, rel_pos_t, has_cls_embed):
    """Per-query-row temporal rel-pos table [B, q_n, heads, k_t]
    (`attention.py:120-159` up to the bias expansion)."""
    sp_idx = 1 if has_cls_embed else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    dt = int(2 * max(q_t, k_t) - 1)
    q_t_ratio = max(k_t / q_t, 1.0)
    k_t_ratio = max(q_t / k_t, 1.0)
    dist_t = (
        np.arange(q_t)[:, None] * q_t_ratio - np.arange(k_t)[None, :] * k_t_ratio
    )
    dist_t += (k_t - 1) * k_t_ratio
    Rt = interpolate_rel_pos(rel_pos_t, dt)[dist_t.astype(np.int64)]  # [qt, kt, C]
    B, _, n_head, dim = q.shape
    r_q = q[:, sp_idx:].reshape(B, q_t, q_h, q_w, n_head, dim)
    rel = jnp.einsum("bthwyc,tkc->bthwyk", r_q, Rt.astype(q.dtype))
    return rel.reshape(B, q_t * q_h * q_w, n_head, k_t)


def rel_pos_spatial_bias(
    q, q_shape, k_shape, rel_pos_h, rel_pos_w, has_cls_embed
):
    """Decomposed spatial rel-pos bias in the attention-matrix layout.

    TPU layout note: never materialize tensors whose minor dims are tiny
    (k_h/k_w ~ 7 pad to 128-lane tiles, an ~18x HBM blowup — measured 63%
    of MViTv2-S forward time). Expand along the kN axis instead so every
    intermediate keeps the [B, h, qN, kN] layout:
      k index = ((k_t * k_h) + kh) * k_w + kw
    """
    k_t, k_h, k_w = k_shape
    bias_h, bias_w = rel_q_tables_spatial(
        q, q_shape, k_shape, rel_pos_h, rel_pos_w, has_cls_embed
    )  # [B, q_n, heads, k_h/k_w]
    bias_h = jnp.repeat(bias_h, k_w, axis=-1)  # [.., k_h*k_w]
    bias_w = jnp.tile(bias_w, (1, 1, 1, k_h))  # [.., k_h*k_w]
    bias = jnp.tile(bias_h + bias_w, (1, 1, 1, k_t))  # [.., kN]
    bias = bias.transpose(0, 2, 1, 3)  # [B, heads, q_n, kN] (attn layout)
    if has_cls_embed:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))
    return bias


def rel_pos_temporal_bias(q, q_shape, k_shape, rel_pos_t, has_cls_embed):
    """Temporal rel-pos bias; same layout rule as the spatial bias."""
    k_t, k_h, k_w = k_shape
    bias = rel_q_table_temporal(q, q_shape, k_shape, rel_pos_t, has_cls_embed)
    bias = jnp.repeat(bias, k_h * k_w, axis=-1)  # [.., kN]
    bias = bias.transpose(0, 2, 1, 3)  # [B, heads, q_n, kN]
    if has_cls_embed:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))
    return bias


def decimate_pool_windows(x, thw, kernel, stride):
    """Select the token rows a strided pooling conv actually reads.

    For spatially disjoint pool windows (stride >= kernel on H/W — the MViT
    KV pools at stride (1,8,8)/(1,4,4), `MVITv2_S_16x4.yaml`
    POOL_KV_STRIDE_ADAPTIVE), a stride-s SAME conv with kernel k only ever
    touches rows {s*p - k//2 .. s*p - k//2 + k-1}: 3 of every 8 at stride 8.
    Everything is pad + reshape + static slice (rows within a window group
    are unique, so the gradient is a plain pad — no scatter), which lets the
    K/V *projection* run on the decimated token set too: at stride (1,8,8)
    that is 14% of the grid's matmul FLOPs and HBM bytes.

    x: [B, N, C] tokens (no cls), thw = (T, H, W).
    Returns ([B, Tp, Ph, kh, Pw, kw, C], (Tp, Ph, Pw)) where Tp = T + 2*(kt//2)
    (temporal axis keeps SAME padding; the pool conv then runs VALID over t).
    """
    B, N, C = x.shape
    T, H, W = thw
    kt, kh, kw = kernel
    st, sh, sw = stride
    assert st == 1 and sh >= kh and sw >= kw, (kernel, stride)
    pt, ph, pw = kt // 2, kh // 2, kw // 2
    Ph = (H + 2 * ph - kh) // sh + 1
    Pw = (W + 2 * pw - kw) // sw + 1
    g = x.reshape(B, T, H, W, C)
    g = jnp.pad(
        g,
        (
            (0, 0),
            (pt, pt),
            (ph, max(0, Ph * sh - H - ph)),
            (pw, max(0, Pw * sw - W - pw)),
            (0, 0),
        ),
    )
    Tp = T + 2 * pt
    # Window p covers padded rows [s*p, s*p + k): group rows into [P, s]
    # blocks and keep the first k of each.
    g = g[:, :, : Ph * sh].reshape(B, Tp, Ph, sh, -1, C)[:, :, :, :kh]
    g = g[:, :, :, :, : Pw * sw].reshape(B, Tp, Ph, kh, Pw, sw, C)[
        :, :, :, :, :, :kw
    ]
    return g, (Tp, Ph, Pw)


def _expansion_matrix(kt, kh, kw, nk, nkp, has_cls, with_rt):
    """Ecat [KH+KW(+KT), NKP] 0/1 expansion matrix for folding the
    decomposed rel-pos bias into the QK^T matmul.

    k column j: 0 = cls (zero bias); j-1 = (t*KH + h)*KW + w; j >= nk is
    padding. Built with numpy at trace time (a few KB)."""
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
    return E


def _pool_conv(x, w, stride, padding):
    """Depthwise NDHWC conv (w [kt,kh,kw,1,C], groups = C).

    Native XLA gradients, by measurement: every hand-rolled replacement
    (flip-kernel dx + Pallas single-pass dw, lhs-dilated strided dx,
    shifted-MAC, token-shift FMAs, disjoint-window lowering) measured worse
    end-to-end on v5e across rounds 1-3 — see the ROADMAP.md dead-end
    ledger; the losing implementations live in git history.
    """
    return jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(stride), padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=w.shape[-1],
    )


@functools.lru_cache(maxsize=None)
def _flat_gln_fn(H, C, eps):
    """FlatGroupLN core with a hand-written backward, per (heads, C, eps).

    f(x [B,N,HC], scale_t [HC] f32, bias_t [HC] f32) -> y f32. Forward math
    is identical to the inline stats-dots version; the backward computes
    the standard LN gradient with the same masked-matmul trick instead of
    autodiff through the E[x^2] chain (whose transposed dots are the LN
    backward cost in the round-3 per-op profile). Residuals: x + the tiny
    [B,N,H] mean/inv; xhat is recomputed in backward."""
    m01 = np.kron(np.eye(H), np.ones((C, 1), np.float32))
    mj_np, mt_np = m01 / C, m01.T

    def _stats(x):
        xf = x.astype(jnp.float32)
        if x.dtype == jnp.float32:
            mean = xf @ jnp.asarray(mj_np)
            var = (xf * xf) @ jnp.asarray(mj_np) - mean * mean
        else:
            mean = jnp.einsum(
                "bnk,kh->bnh", x, jnp.asarray(m01, x.dtype),
                preferred_element_type=jnp.float32) / C
            var = jnp.einsum(
                "bnk,kh->bnh", xf * xf, jnp.asarray(m01),
                preferred_element_type=jnp.float32) / C - mean * mean
        return xf, mean, jax.lax.rsqrt(var + eps)

    @jax.custom_vjp
    def f(x, scale_t, bias_t):
        xf, mean, inv = _stats(x)
        mt = jnp.asarray(mt_np)
        return (xf - mean @ mt) * (inv @ mt) * scale_t + bias_t

    def fwd(x, scale_t, bias_t):
        xf, mean, inv = _stats(x)
        mt = jnp.asarray(mt_np)
        y = (xf - mean @ mt) * (inv @ mt) * scale_t + bias_t
        return y, (x, mean, inv, scale_t)

    def bwd(res, g):
        x, mean, inv, scale_t = res
        mj, mt = jnp.asarray(mj_np), jnp.asarray(mt_np)
        gf = g.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        inv_f = inv @ mt
        xhat = (xf - mean @ mt) * inv_f
        gs = gf * scale_t
        m1 = (gs @ mj) @ mt  # per-block mean of gs, broadcast
        m2 = ((gs * xhat) @ mj) @ mt  # per-block mean of gs*xhat
        dx = ((gs - m1 - xhat * m2) * inv_f).astype(x.dtype)
        dscale_t = jnp.sum(gf * xhat, axis=(0, 1))  # [HC]
        dbias_t = jnp.sum(gf, axis=(0, 1))
        return dx, dscale_t, dbias_t

    f.defvjp(fwd, bwd)
    return f


class FlatGroupLN(nn.Module):
    """Per-head LayerNorm on the FLAT [B, N, heads*C] layout.

    Same params (scale/bias of shape (C,), shared across heads — matching
    ``nn.LayerNorm`` applied to [B, N, H, C]) and same math (use_fast_variance
    E[x^2]-E[x]^2 in f32), but the per-C-block statistics are computed with
    two tiny 0/1 averaging matmuls instead of reshaping the tensor to 4-d —
    the [B,N,H,C] <-> [B,N,H*C] reshapes around pool LNs are physical
    relayout copies on TPU (tools/profile_step.py).

    Dtype note: the affine is applied in f32 with ONE rounding at the end;
    ``nn.LayerNorm(dtype=bf16)`` rounds before its bf16 affine, so bit-
    exactness with the 4-d form holds in f32 compute only — under bf16 the
    match is tolerance-level (~1 ulp), which the recipe treats as within
    the normal bf16 noise floor (ADVICE r2)."""

    heads: int
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-6
    custom_grad: bool = False  # hand-written LN backward (TPU.FLAT_LN_VJP)

    @nn.compact
    def __call__(self, x):
        B, N, HC = x.shape
        H = self.heads
        C = HC // H
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if self.custom_grad:
            scale_t = jnp.tile(scale.astype(jnp.float32), H)
            bias_t = jnp.tile(bias.astype(jnp.float32), H)
            y = _flat_gln_fn(H, C, self.epsilon)(x, scale_t, bias_t)
            return y.astype(self.dtype)
        m01 = np.kron(np.eye(H), np.ones((C, 1), np.float32))  # [HC, H] 0/1
        mt = jnp.asarray(m01.T)  # [H, HC] 0/1
        xf = x.astype(jnp.float32)
        if x.dtype == jnp.float32:
            # Bit-exact path (parity tests): f32 stats dots.
            mj = jnp.asarray(m01 / C)
            mean = xf @ mj  # [B, N, H]
            var = (xf * xf) @ mj - mean * mean
        else:
            # bf16 input: feed the 0/1 stats dots the bf16 tensor directly
            # with f32 accumulation (halves the dot read bytes; measured on
            # the per-op profile where these dots are the LN cost). The sum
            # is over the SAME bf16-rounded values flax's LayerNorm(dtype=
            # bf16) promotes, the 0/1 weights are exact in bf16, and the
            # MXU accumulates bf16 products exactly into f32 — so this is
            # the same tolerance class as the 4-d form, not a new rounding.
            mb = jnp.asarray(m01, x.dtype)
            mean = jnp.einsum(
                "bnk,kh->bnh", x, mb,
                preferred_element_type=jnp.float32) / C
            x2 = (xf * xf).astype(jnp.float32)
            var = jnp.einsum(
                "bnk,kh->bnh", x2, jnp.asarray(m01),
                preferred_element_type=jnp.float32) / C - mean * mean
        mean_f = mean @ mt  # [B, N, HC]
        inv_f = jax.lax.rsqrt(var + self.epsilon) @ mt
        scale_t = jnp.tile(scale.astype(jnp.float32), H)
        bias_t = jnp.tile(bias.astype(jnp.float32), H)
        return ((xf - mean_f) * inv_f * scale_t + bias_t).astype(self.dtype)


class AttentionPool(nn.Module):
    """Pool the token grid of Q/K/V (`attention.py:13-49` attention_pool).

    mode 'conv': depthwise conv + LayerNorm; 'max'/'avg': pooling, no norm.
    Input [B, heads, N, C]; cls token (if any) bypasses pooling.
    With ``flat=True`` the input/output are [B, N, heads*C] (heads folded
    into lanes); math and param tree are unchanged.
    """

    kernel: Sequence[int]
    stride: Sequence[int]
    mode: str
    has_cls_embed: bool
    pad_lanes: bool = False  # 128-lane channel padding (eval graphs only)
    use_pallas_pools: bool = False  # hand-written depthwise kernel on TPU
    pool_impl: str = "xla"  # xla | shift | custom_vjp | pallas (TPU only)
    flat: bool = False  # tokens stay [B, N, heads*C]; no 4-d per-head form
    heads: int = 1  # only read when flat (kernel tiling + LN groups)
    flat_ln_vjp: bool = False  # hand-written FlatGroupLN backward
    dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-6

    def is_identity(self):
        return (
            len(self.kernel) == 0
            or (np.prod(self.kernel) == 1 and np.prod(self.stride) == 1)
        )

    @nn.compact
    def __call__(
        self, x, thw_shape, sparse_grid=None, sparse_bias=None
    ) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
        """x: [B, N, heads, C] tokens-major (transpose-free layout: the
        fold to the [B, T, H, W, heads*C] conv grid and back is a pure
        reshape, so no physical transpose is ever materialized).

        sparse_grid: (Tp, Ph, Pw) when x holds *decimated* window tokens
        (cls first, then decimate_pool_windows order) — conv mode only; the
        pool is then a 9-tap einsum + valid temporal sum over the decimated
        grid instead of a full-grid grouped conv. Exact same math."""
        if self.is_identity():
            return x, tuple(thw_shape)
        if self.flat:
            B, N, HC_in = x.shape
            H = self.heads
            # flat callers MUST pass the true head count: with the default
            # heads=1 the pool_kernel silently becomes (k.., 1, H*C) and the
            # param tree no longer matches checkpoints (ADVICE r2).
            assert H >= 1 and HC_in % H == 0, (
                f"flat AttentionPool needs heads dividing {HC_in}, got {H}"
            )
            C = HC_in // H
        else:
            B, N, H, C = x.shape

        def _ln(t):
            if _DIAG_SKIP_POOL_LN:
                return t
            if self.flat:
                return FlatGroupLN(
                    heads=H, dtype=self.dtype, epsilon=self.norm_eps,
                    custom_grad=self.flat_ln_vjp, name="norm",
                )(t)
            return nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, name="norm"
            )(t)

        if sparse_grid is not None:
            assert self.mode == "conv"
            kt, kh, kw = self.kernel
            st, sh, sw = self.stride
            Tp, Ph, Pw = sparse_grid
            T_out = Tp - 2 * (kt // 2)
            T_in, H_in, W_in = thw_shape
            if self.has_cls_embed:
                cls_tok, x = x[:, :1], x[:, 1:]
            z = x.reshape(B, Tp, Ph, kh, Pw, kw, H * C)
            kernel = self.param(
                "pool_kernel",
                trunc_normal_init(0.02),
                tuple(self.kernel) + (1, C),
            )
            tiled = jnp.tile(kernel.reshape(kt, kh, kw, C), (1, 1, 1, H)).astype(
                self.dtype
            )
            # Unrolled taps over DISJOINT strided views: the (i, j) slices
            # partition z, so the 27 FMAs read each element exactly once in
            # the tokens-major layout — no relayout. (The einsum form made
            # XLA physically transpose the 6-d gather: 54 MB copies/block,
            # tools/hlo_rank.py.)
            acc = None
            for dt in range(kt):
                zt = z[:, dt : dt + T_out]
                for i in range(kh):
                    for j in range(kw):
                        term = (
                            zt[:, :, :, i, :, j, :] * tiled[dt, i, j]
                        ).astype(jnp.float32)
                        acc = term if acc is None else acc + term
            proj_bias = sparse_bias
            if proj_bias is not None:
                # The dense conv zero-pads the *projected* grid; the
                # decimated tokens were padded before projection, so the
                # projection bias leaks into padding taps. Rather than a
                # full-tensor select on z (measured 108 MB/pass at b1),
                # subtract bias * (sum of kernel taps at invalid positions)
                # — a [T, Ph, Pw, HC] correction computed from tiny arrays.
                valid_t = ((np.arange(Tp) - kt // 2) < T_in) & (
                    (np.arange(Tp) - kt // 2) >= 0
                )
                h_idx = (
                    sh * np.arange(Ph)[:, None]
                    + np.arange(kh)[None, :]
                    - kh // 2
                )
                w_idx = (
                    sw * np.arange(Pw)[:, None]
                    + np.arange(kw)[None, :]
                    - kw // 2
                )
                invalid = ~(
                    valid_t[:, None, None, None, None]
                    & ((h_idx >= 0) & (h_idx < H_in))[None, :, :, None, None]
                    & ((w_idx >= 0) & (w_idx < W_in))[None, None, None, :, :]
                )  # [Tp, Ph, kh, Pw, kw]
                inv_taps = np.stack(
                    [
                        invalid[dt : dt + T_out].astype(np.float32)
                        for dt in range(kt)
                    ],
                    axis=1,
                )  # [T_out, kt, Ph, kh, Pw, kw]
                if inv_taps.any():
                    kinv = jnp.einsum(
                        "tdpiqj,dijc->tpqc",
                        jnp.asarray(inv_taps, self.dtype),
                        tiled,
                    )  # [T_out, Ph, Pw, HC]
                    acc = acc - proj_bias.astype(self.dtype) * kinv[None]
            x = acc.astype(self.dtype).reshape(
                (B, -1, H * C) if self.flat else (B, -1, H, C)
            )
            if self.has_cls_embed:
                x = jnp.concatenate([cls_tok.astype(self.dtype), x], axis=1)
            x = _ln(x)
            return x, (T_out, Ph, Pw)
        T, Hh, Ww = thw_shape
        if self.has_cls_embed:
            cls_tok, x = x[:, :1], x[:, 1:]
        padding = [(k // 2, k // 2) for k in self.kernel]
        if self.mode == "conv":
            # TPU layout: fold heads into channels (depthwise channels
            # H*C >= 128 fills VPU lanes; the reference folds heads into the
            # *batch*, `attention.py:13-49`). The per-head weights are shared
            # in the reference, so the folded kernel is the head-dim kernel
            # tiled H times — numerically identical. The fold must be
            # h-major (folded j = h*C + c) to line up with that tiling.
            x = x.reshape(B, T, Hh, Ww, H * C)
            kernel = self.param(
                "pool_kernel",
                trunc_normal_init(0.02),
                tuple(self.kernel) + (1, C),
            )
            tiled = jnp.tile(kernel, (1, 1, 1, 1, H)).astype(self.dtype)
            hc = H * C
            impl = "pallas" if self.use_pallas_pools else self.pool_impl
            on_tpu = jax.default_backend() == "tpu"
            if impl == "auto":
                # Measured on v5e end-to-end (bs 8): every alternative
                # lowering loses to XLA's grouped conv — custom_vjp bwd
                # 115.9 (neutral), disjoint-window 122.4, shifted-MAC
                # worse still, vs 116.0 baseline. "auto" therefore resolves
                # to XLA; the other impls stay selectable for other
                # hardware/shapes.
                impl = "xla"
            if impl == "slice":
                # DIAGNOSTIC lower bound (wrong math, zero FLOPs): pooling
                # as pure strided subsampling, to price the depthwise pool
                # convs inside the end-to-end step (ablate.py pool_slice).
                st, sh, sw = self.stride
                x = x[:, ::st, ::sh, ::sw].astype(self.dtype)
            elif (
                impl == "pallas"
                and on_tpu
                and tuple(self.kernel) == (3, 3, 3)
                and tuple(self.stride) == (1, 1, 1)
            ):
                # Hand-written depthwise kernel: the hot stride-1 q-pool.
                # 27 shifted FMAs on VMEM tiles; channel lanes filled by
                # Mosaic tiling, no grouped-conv lowering (and no XLA
                # grouped-conv-gradient miscompile) at any channel count.
                from pmv_tpu.ops.depthwise_pallas import depthwise3x3x3

                x = depthwise3x3x3(
                    x.astype(self.dtype), tiled.reshape(3, 3, 3, hc)
                )
            else:
                # TPU: depthwise convs want 128-lane-aligned channels
                # (measured ~free at C=128 vs 1.7 ms at C=96 on v5e).
                # Zero-pad channels to a lane multiple and slice back —
                # exact, zero output in padding. Eval graphs only: XLA's
                # grouped-conv *gradient* simplification miscompiles the
                # pad/slice pair (batch_group_count mismatch), so training
                # keeps the native channel count.
                hc_pad = -(-hc // 128) * 128 if self.pad_lanes else hc
                if hc_pad != hc:
                    x = jnp.pad(x, ((0, 0),) * 4 + ((0, hc_pad - hc),))
                    tiled = jnp.pad(
                        tiled, ((0, 0),) * 3 + ((0, 0), (0, hc_pad - hc))
                    )
                x = _pool_conv(
                    x.astype(self.dtype), tiled, tuple(self.stride), padding
                )
                if hc_pad != hc:
                    x = x[..., :hc]
            new_thw = (x.shape[1], x.shape[2], x.shape[3])
            x = x.reshape((B, -1, H * C) if self.flat else (B, -1, H, C))
        else:
            # Pooling is per-channel, so the folded H*C grid works for
            # max/avg too — same free reshape as the conv path.
            x = x.reshape(B, T, Hh, Ww, H * C)
            if self.mode == "max":
                x = max_pool_3d(x, self.kernel, self.stride, padding)
            elif self.mode == "avg":
                x = avg_pool_3d(x, self.kernel, self.stride, padding)
            else:
                raise NotImplementedError(f"Unsupported pool mode {self.mode}")
            new_thw = (x.shape[1], x.shape[2], x.shape[3])
            x = x.reshape((B, -1, H * C) if self.flat else (B, -1, H, C))
        if self.has_cls_embed:
            x = jnp.concatenate([cls_tok, x], axis=1)
        if self.mode == "conv":
            x = _ln(x)
        return x, new_thw


class MultiScaleAttention(nn.Module):
    """Pooling attention (`attention.py:166-461`), static-shape TPU variant."""

    dim_out: int
    num_heads: int
    input_size: Sequence[int]  # (T, H, W) token grid at block input
    qkv_bias: bool = False
    drop_rate: float = 0.0
    kernel_q: Sequence[int] = ()
    kernel_kv: Sequence[int] = ()
    stride_q: Sequence[int] = ()
    stride_kv: Sequence[int] = ()
    has_cls_embed: bool = True
    mode: str = "conv"
    pool_first: bool = False
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    separate_qkv: bool = False
    # hw_switch == reference hw_switch_auto: rel-pos H/W tables swap when
    # the (static) grid is portrait. On for BOTH orientations' programs
    # whenever the recipe enables SWITCH_AUTO (`video_model_builder.py:1786`).
    hw_switch: bool = False
    use_pallas_pools: bool = False  # hand-written depthwise pool kernel
    pool_impl: str = "xla"  # depthwise pool implementation (AttentionPool)
    sparse_kv: bool = True  # decimated K/V projection+pool when stride>=kernel
    flat_pools: bool = False  # q/k/v stay [B, N, H*C] through the pools
    flat_ln_vjp: bool = False  # custom FlatGroupLN backward (TPU.FLAT_LN_VJP)
    # Flat pools off above this GLOBAL (jit-traced) batch; builders scale
    # the per-data-shard config value by the data-axis size (mvit.py).
    # Motivated by the compile-helper crash at bs32/chip (round-3 probes);
    # 0 = no limit. Layout-only: param tree and math identical either way.
    flat_pools_max_batch: int = 16
    attn_impl: str = "batched"  # "batched" (bhqk einsums) | "per_head"
    attn_q_chunk: int = 0  # q-tiled attention chunk rows (0 = off)
    attn_chunk_remat: bool = True  # recompute chunk probs in backward
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw_shape, deterministic=True):
        B, N, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        scale = head_dim ** -0.5

        def dense(feats, name, use_bias=None):
            return nn.Dense(
                feats,
                use_bias=self.qkv_bias if use_bias is None else use_bias,
                dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name=name,
            )

        # Disjoint-window KV pooling (stride >= kernel spatially): decimate
        # the token set BEFORE the K/V projection so both the projection
        # matmuls and the pooling conv only touch the 9/64 (stride 8) or
        # 9/16 (stride 4) of rows the strided conv reads. Exact math —
        # projection is per-token — and no grouped-conv lowering at all.
        use_sparse_kv = (
            self.sparse_kv
            and not self.pool_first
            and not self.separate_qkv
            and self.mode == "conv"
            and len(self.kernel_kv) > 0
            and len(self.stride_kv) > 0
            and self.stride_kv[0] == 1
            and self.stride_kv[1] >= self.kernel_kv[1]
            and self.stride_kv[2] >= self.kernel_kv[2]
            and int(np.prod(self.stride_kv)) > 1
        )

        # Flat-pool layout (MVIT.FLAT_POOLS): q/k/v keep the projection's
        # [B, N, heads*C] shape through the pools; the per-head 4-d form is
        # created ONCE at the einsum boundary. The 4-d<->grid reshapes at
        # every pool are physical relayout copies on TPU (~9 ms/step,
        # tools/profile_step.py); the flat grid fold [B,N,HC]->[B,T,H,W,HC]
        # is tiling-compatible. Exact same math and param tree (pool LN runs
        # per C-block via FlatGroupLN).
        use_flat = (
            self.flat_pools
            and not self.pool_first
            and not self.separate_qkv
            and self.mode == "conv"
            and self.pool_impl in ("xla", "auto")
            and not self.use_pallas_pools
            and (
                self.flat_pools_max_batch <= 0
                or B <= self.flat_pools_max_batch
            )
        )
        if (
            self.flat_pools
            and not use_flat
            and self.flat_pools_max_batch > 0
            and B > self.flat_pools_max_batch
            and not _FLAT_FALLBACK_WARNED
        ):
            # Trace-time (not per-step) notice: perf-only layout fallback.
            _FLAT_FALLBACK_WARNED.append(True)
            logging.getLogger(__name__).warning(
                "FLAT_POOLS disabled at global batch %d > %d "
                "(MVIT.FLAT_POOLS_MAX_BATCH x data shards); "
                "falling back to the 4-d pool layout (layout-only).",
                B, self.flat_pools_max_batch,
            )

        # Tokens-major [B, N, heads, C] layout end-to-end: head split,
        # pool grids, and the final merge are all pure reshapes; the only
        # data movement XLA must schedule is inside the attention einsums.
        kv_grid = None
        bias_k = bias_v = None
        if self.pool_first:
            fold = self.num_heads
            q = k = v = x.reshape(B, N, fold, -1)
        elif self.separate_qkv:
            q = dense(self.dim_out, "q")(x).reshape(B, N, self.num_heads, -1)
            k = dense(self.dim_out, "k")(x).reshape(B, N, self.num_heads, -1)
            v = dense(self.dim_out, "v")(x).reshape(B, N, self.num_heads, -1)
        elif use_sparse_kv:
            toks = x[:, 1:] if self.has_cls_embed else x
            g6, kv_grid = decimate_pool_windows(
                toks, thw_shape, self.kernel_kv, self.stride_kv
            )
            kv_tokens = g6.reshape(B, -1, x.shape[-1])
            if self.has_cls_embed:
                kv_tokens = jnp.concatenate([x[:, :1], kv_tokens], axis=1)
            q, k, v, (bias_k, bias_v) = FusedQKVSplitDots(
                dim_out=self.dim_out, num_heads=self.num_heads,
                use_bias=self.qkv_bias,
                dtype=self.dtype, name="qkv",
            )(x, kv=kv_tokens, flat=use_flat)
        else:
            q, k, v = FusedQKVSplitDots(
                dim_out=self.dim_out, num_heads=self.num_heads,
                use_bias=self.qkv_bias,
                dtype=self.dtype, name="qkv",
            )(x, flat=use_flat)

        # Lane padding is exact but only gradient-safe in eval graphs.
        pad_lanes = deterministic and jax.default_backend() == "tpu"
        q, q_shape = AttentionPool(
            kernel=self.kernel_q, stride=self.stride_q, mode=self.mode,
            has_cls_embed=self.has_cls_embed, pad_lanes=pad_lanes,
            use_pallas_pools=self.use_pallas_pools,
            pool_impl=self.pool_impl,
            flat=use_flat, heads=self.num_heads,
            flat_ln_vjp=self.flat_ln_vjp,
            dtype=self.dtype, name="pool_q",
        )(q, thw_shape)
        k, k_shape = AttentionPool(
            kernel=self.kernel_kv, stride=self.stride_kv, mode=self.mode,
            has_cls_embed=self.has_cls_embed, pad_lanes=pad_lanes,
            use_pallas_pools=self.use_pallas_pools,
            pool_impl=self.pool_impl,
            flat=use_flat, heads=self.num_heads,
            flat_ln_vjp=self.flat_ln_vjp,
            dtype=self.dtype, name="pool_k",
        )(k, thw_shape, sparse_grid=kv_grid, sparse_bias=bias_k)
        v, v_shape = AttentionPool(
            kernel=self.kernel_kv, stride=self.stride_kv, mode=self.mode,
            has_cls_embed=self.has_cls_embed, pad_lanes=pad_lanes,
            use_pallas_pools=self.use_pallas_pools,
            pool_impl=self.pool_impl,
            flat=use_flat, heads=self.num_heads,
            flat_ln_vjp=self.flat_ln_vjp,
            dtype=self.dtype, name="pool_v",
        )(v, thw_shape, sparse_grid=kv_grid, sparse_bias=bias_v)
        if use_flat:
            # One per-head unfold per tensor, at the einsum boundary.
            q = q.reshape(B, q.shape[1], self.num_heads, head_dim)
            k = k.reshape(B, k.shape[1], self.num_heads, head_dim)
            v = v.reshape(B, v.shape[1], self.num_heads, head_dim)

        if self.pool_first:
            def refold(t, t_shape, name):
                t_n = int(np.prod(t_shape)) + (1 if self.has_cls_embed else 0)
                t = t.reshape(B, t_n, -1)
                t = dense(self.dim_out, name)(t)
                return t.reshape(B, t_n, self.num_heads, -1)

            q = refold(q, q_shape, "q")
            k = refold(k, k_shape, "k")
            v = refold(v, v_shape, "v")

        # --- rel-pos parameters (shapes fixed by construction-time geometry)
        rp_h = rp_w = rel_pos_t = None
        if self.rel_pos_spatial:
            rel_sp_dim_h = 2 * max(
                self.input_size[1] // (self.stride_q[1] if self.stride_q else 1),
                self.input_size[1] // (self.stride_kv[1] if self.stride_kv else 1),
            ) - 1
            rel_sp_dim_w = 2 * max(
                self.input_size[2] // (self.stride_q[2] if self.stride_q else 1),
                self.input_size[2] // (self.stride_kv[2] if self.stride_kv else 1),
            ) - 1
            init = (
                nn.initializers.zeros
                if self.rel_pos_zero_init
                else trunc_normal_init(0.02)
            )
            rel_pos_h = self.param("rel_pos_h", init, (rel_sp_dim_h, head_dim))
            rel_pos_w = self.param("rel_pos_w", init, (rel_sp_dim_w, head_dim))
            if self.hw_switch and thw_shape[1] > thw_shape[2]:
                # `attention.py:414-435`: when switch-auto is on and the
                # *current* grid is portrait (H > W), the H axis uses the W
                # table and vice versa. thw_shape is static at trace time so
                # each orientation specializes to the reference's dynamic
                # branch exactly.
                rp_h, rp_w = rel_pos_w, rel_pos_h
            else:
                rp_h, rp_w = rel_pos_h, rel_pos_w
        if self.rel_pos_temporal:
            init = (
                nn.initializers.zeros
                if self.rel_pos_zero_init
                else trunc_normal_init(0.02)
            )
            rel_pos_t = self.param(
                "rel_pos_t", init, (2 * self.input_size[0] - 1, head_dim)
            )

        if _DIAG_ATTENTION_IDENTITY:
            x = q  # [B, Nq', H, D] — same shape as the attention output
        elif self.rel_pos_spatial:
            # Bias folded into the QK^T matmul: S = [q*scale | rcat] @
            # [k | E^T]^T where rcat = [rh|rw(|rt)] are the compact per-row
            # rel tables and E the 0/1 expansion matrix. The [Nq, Nk] bias
            # is produced by the same MXU pass as QK^T (d 96+22 pads to one
            # 128-lane tile) and nothing but the attention matrix itself is
            # ever materialized. Exact: E entries are 0/1.
            k_t, k_h, k_w = k_shape
            nk = k.shape[1]
            rh, rw = rel_q_tables_spatial(
                q, q_shape, k_shape, rp_h, rp_w, self.has_cls_embed
            )
            tables = [rh, rw]
            if self.rel_pos_temporal:
                tables.append(
                    rel_q_table_temporal(
                        q, q_shape, k_shape, rel_pos_t, self.has_cls_embed
                    )
                )
            rcat = jnp.concatenate(tables, axis=-1)  # [B, q_n, H, ext]
            if self.has_cls_embed:
                # cls query row carries zero bias.
                rcat = jnp.pad(rcat, ((0, 0), (1, 0), (0, 0), (0, 0)))
            E = _expansion_matrix(
                k_t, k_h, k_w, nk, nk, self.has_cls_embed,
                with_rt=self.rel_pos_temporal,
            )
            # Measured alternative (v5e, bs 8): computing scores + bias as
            # TWO einsums (no concat copies of q/k) is 9 ms/step SLOWER
            # (125.3 vs 116.0) — the single extended matmul wins.
            q_ext = jnp.concatenate(
                [q * scale, rcat.astype(q.dtype)], axis=-1
            )
            e_bh = jnp.broadcast_to(
                jnp.asarray(E.T, q.dtype)[None, :, None, :],
                (B, nk, self.num_heads, E.shape[0]),
            )
            k_ext = jnp.concatenate([k, e_bh], axis=-1)
            if (
                self.attn_q_chunk > 0
                and q.shape[1] > self.attn_q_chunk
                and self.attn_impl != "per_head"
            ):
                x = chunked_attention(
                    q_ext, k_ext, v, self.attn_q_chunk,
                    remat=self.attn_chunk_remat,
                )
            elif self.attn_impl == "per_head" and self.num_heads > 1:
                # Head-sliced einsums: every dot has batch dim b only, so
                # q/k/v and the probs keep their natural layouts (the
                # batched bqhc,bkhc->bhqk form makes XLA relayout the big
                # q-side tensor and the probs, h<->q transposes).
                outs = []
                for hd in range(self.num_heads):
                    s = jnp.einsum(
                        "bqc,bkc->bqk", q_ext[:, :, hd], k_ext[:, :, hd]
                    )
                    p = jax.nn.softmax(s, axis=-1)
                    outs.append(jnp.einsum("bqk,bkc->bqc", p, v[:, :, hd]))
                x = jnp.stack(outs, axis=2)
            else:
                attn = jnp.einsum("bqhc,bkhc->bhqk", q_ext, k_ext)
                attn = jax.nn.softmax(attn, axis=-1)
                x = jnp.einsum("bhqk,bkhc->bqhc", attn, v)
        elif self.attn_impl == "per_head" and self.num_heads > 1 and not self.rel_pos_temporal:
            outs = []
            for hd in range(self.num_heads):
                s = jnp.einsum(
                    "bqc,bkc->bqk", q[:, :, hd] * scale, k[:, :, hd]
                )
                p = jax.nn.softmax(s, axis=-1)
                outs.append(jnp.einsum("bqk,bkc->bqc", p, v[:, :, hd]))
            x = jnp.stack(outs, axis=2)
        elif (
            self.attn_q_chunk > 0
            and q.shape[1] > self.attn_q_chunk
            and not self.rel_pos_temporal
        ):
            x = chunked_attention(
                q * scale, k, v, self.attn_q_chunk,
                remat=self.attn_chunk_remat,
            )
        else:
            attn = jnp.einsum("bqhc,bkhc->bhqk", q * scale, k)
            if self.rel_pos_temporal:
                attn = attn + rel_pos_temporal_bias(
                    q, q_shape, k_shape, rel_pos_t, self.has_cls_embed
                )
            attn = jax.nn.softmax(attn, axis=-1)
            x = jnp.einsum("bhqk,bkhc->bqhc", attn, v)

        if self.residual_pooling:
            # `attention.py:450-454`: add pooled q (skipping cls row when on).
            if self.has_cls_embed:
                # Same math as x.at[:, 1:].add(q[:, 1:]), but the full add
                # fuses for free and the update-slice touches ONE row
                # instead of N-1 (the at[].add form lowered to a whole-
                # tensor dynamic-update-slice, ~0.28 ms x 16 blocks on v5e,
                # tools/profile_step.py).
                x = (x + q).at[:, :1].set(x[:, :1])
            else:
                x = x + q

        x = x.reshape(B, -1, self.dim_out)
        x = dense(self.dim_out, "proj", use_bias=True)(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x, q_shape


class MultiScaleBlock(nn.Module):
    """Transformer block with pooled attention (`attention.py:464-589`)."""

    dim: int
    dim_out: int
    num_heads: int
    input_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    drop_path: float = 0.0
    layer_scale_init_value: float = 0.0
    kernel_q: Sequence[int] = ()
    kernel_kv: Sequence[int] = ()
    stride_q: Sequence[int] = ()
    stride_kv: Sequence[int] = ()
    mode: str = "conv"
    has_cls_embed: bool = True
    pool_first: bool = False
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    dim_mul_in_att: bool = False
    separate_qkv: bool = False
    hw_switch: bool = False
    use_pallas_pools: bool = False
    pool_impl: str = "xla"
    sparse_kv: bool = True
    flat_pools: bool = False
    flat_pools_max_batch: int = 16
    flat_ln_vjp: bool = False
    attn_impl: str = "batched"
    attn_q_chunk: int = 0
    attn_chunk_remat: bool = True
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw_shape, deterministic=True):
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim
        x_norm = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        if _DIAG_SKIP_ATTN_BRANCH:
            # Price the whole attention module (qkv+pools+attn+proj) inside
            # the full step: zero branch of the correct pooled shape.
            B, N, _ = x.shape
            T, Hh, Ww = thw_shape
            if len(self.stride_q) > 0 and int(np.prod(self.stride_q)) > 1:
                thw_shape_new = tuple(
                    int(-(-d // s)) for d, s in zip(thw_shape, self.stride_q)
                )
            else:
                thw_shape_new = tuple(thw_shape)
            n_new = int(np.prod(thw_shape_new)) + (
                1 if self.has_cls_embed else 0
            )
            x_block = jnp.zeros((B, n_new, att_dim), self.dtype)
        else:
            x_block, thw_shape_new = MultiScaleAttention(
            dim_out=att_dim,
            num_heads=self.num_heads,
            input_size=self.input_size,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            has_cls_embed=self.has_cls_embed,
            mode=self.mode,
            pool_first=self.pool_first,
            rel_pos_spatial=self.rel_pos_spatial,
            rel_pos_temporal=self.rel_pos_temporal,
            rel_pos_zero_init=self.rel_pos_zero_init,
            residual_pooling=self.residual_pooling,
            separate_qkv=self.separate_qkv,
            hw_switch=self.hw_switch,
            use_pallas_pools=self.use_pallas_pools,
            pool_impl=self.pool_impl,
            sparse_kv=self.sparse_kv,
            flat_pools=self.flat_pools,
            flat_pools_max_batch=self.flat_pools_max_batch,
            flat_ln_vjp=self.flat_ln_vjp,
            attn_impl=self.attn_impl,
            attn_q_chunk=self.attn_q_chunk,
            attn_chunk_remat=self.attn_chunk_remat,
            dtype=self.dtype,
            name="attn",
        )(x_norm, thw_shape, deterministic=deterministic)

        if self.layer_scale_init_value > 0:
            gamma_1 = self.param(
                "gamma_1",
                nn.initializers.constant(self.layer_scale_init_value),
                (att_dim,),
            )
        else:
            gamma_1 = None

        if self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(
                self.dim_out, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="proj",
            )(x_norm)

        # Skip-path pooling (max) when Q is strided (`attention.py:499-505`).
        if len(self.stride_q) > 0 and np.prod(self.stride_q) > 1:
            kernel_skip = [s + 1 if s > 1 else s for s in self.stride_q]
            padding_skip = [(k // 2, k // 2) for k in kernel_skip]
            B, N, C = x.shape
            T, H, W = thw_shape
            if self.has_cls_embed:
                cls_tok, toks = x[:, :1], x[:, 1:]
            else:
                toks = x
            toks = toks.reshape(B, T, H, W, C)
            toks = max_pool_3d(
                toks, kernel_skip, self.stride_q, padding_skip
            )
            toks = toks.reshape(B, -1, C)
            x_res = (
                jnp.concatenate([cls_tok, toks], axis=1)
                if self.has_cls_embed
                else toks
            )
        else:
            x_res = x

        branch = gamma_1 * x_block if gamma_1 is not None else x_block
        x = x_res + DropPath(self.drop_path, name="drop_path1")(
            branch, deterministic=deterministic
        )

        if _DIAG_SKIP_MLP:
            return x, thw_shape_new

        mlp_hidden = int(att_dim * self.mlp_ratio)
        x_norm = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        x_mlp = Mlp(
            hidden_features=mlp_hidden,
            out_features=self.dim_out,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="mlp",
        )(x_norm, deterministic=deterministic)

        if not self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(
                self.dim_out, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="proj",
            )(x_norm)

        if self.layer_scale_init_value > 0:
            gamma_2 = self.param(
                "gamma_2",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim_out,),
            )
            x_mlp = gamma_2 * x_mlp
        x = x + DropPath(self.drop_path, name="drop_path2")(
            x_mlp, deterministic=deterministic
        )
        return x, thw_shape_new
