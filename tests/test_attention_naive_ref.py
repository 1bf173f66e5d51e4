"""MultiScaleAttention vs a from-scratch naive reference implementation.

The naive path mirrors the reference (`MViT/slowfast/models/attention.py`
MultiScaleAttention.forward) directly: per-head batch-folded pooling convs,
dense rel-pos bias, explicit softmax. Guards the module against layout /
fold refactors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.attention import MultiScaleAttention, interpolate_rel_pos


def _ln(x, scale, bias, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


def _pool_per_head(x, thw, kernel, stride, w, ln_scale, ln_bias, has_cls):
    """x [B, H, N, C]; per-head depthwise conv with shared weights + LN."""
    B, H, N, C = x.shape
    T, Hh, Ww = thw
    if has_cls:
        cls_tok, x = x[:, :, :1], x[:, :, 1:]
    pad = [(k // 2, k // 2) for k in kernel]
    outs = []
    for h in range(H):
        xh = x[:, h].reshape(B, T, Hh, Ww, C)
        o = jax.lax.conv_general_dilated(
            xh, w.reshape(tuple(kernel) + (1, C)), tuple(stride), pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=C,
        )
        outs.append(o)
    o = jnp.stack(outs, axis=1)  # [B, H, T', H', W', C]
    new_thw = o.shape[2:5]
    o = o.reshape(B, H, -1, C)
    if has_cls:
        o = jnp.concatenate([cls_tok, o], axis=2)
    o = _ln(o, ln_scale, ln_bias)
    return o, new_thw


def _dense_bias(q, q_shape, k_shape, rph, rpw, rpt, has_cls):
    """Reference dense rel-pos bias (`attention.py:67-159`)."""
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, H, _, C = q.shape

    def dist(qs, ks):
        qr, kr = max(ks / qs, 1.0), max(qs / ks, 1.0)
        d = (
            np.arange(qs)[:, None] * qr - np.arange(ks)[None, :] * kr
        ) + (ks - 1) * kr
        return d.astype(int)

    Rh = interpolate_rel_pos(rph, 2 * max(q_h, k_h) - 1)[dist(q_h, k_h)]
    Rw = interpolate_rel_pos(rpw, 2 * max(q_w, k_w) - 1)[dist(q_w, k_w)]
    r_q = q[:, :, sp:].reshape(B, H, q_t, q_h, q_w, C)
    rel_h = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh)
    rel_w = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw)
    bias = (
        rel_h[..., None, :, None] + rel_w[..., None, None, :]
    )  # [B,H,qt,qh,qw,1,kh,kw] broadcast over k_t
    bias = jnp.broadcast_to(
        bias, (B, H, q_t, q_h, q_w, k_t, k_h, k_w)
    )
    if rpt is not None:
        Rt = interpolate_rel_pos(rpt, 2 * max(q_t, k_t) - 1)[dist(q_t, k_t)]
        rel_t = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt)
        bias = bias + rel_t.reshape(B, H, q_t, q_h, q_w, k_t, 1, 1)
    q_n = q_t * q_h * q_w
    k_n = k_t * k_h * k_w
    bias = bias.reshape(B, H, q_n, k_n)
    if has_cls:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))
    return bias


@pytest.mark.parametrize("has_cls,heads", [(True, 2), (False, 3)])
def test_multiscale_attention_matches_naive(has_cls, heads):
    T, Hh, Ww = 4, 6, 6
    dim_in = 6 * heads
    dim_out = 8 * heads
    B = 2
    N = T * Hh * Ww + (1 if has_cls else 0)
    attn = MultiScaleAttention(
        dim_out=dim_out,
        num_heads=heads,
        input_size=(T, Hh, Ww),
        qkv_bias=True,
        kernel_q=(3, 3, 3),
        kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2),
        stride_kv=(1, 3, 3),
        has_cls_embed=has_cls,
        mode="conv",
        rel_pos_spatial=True,
        rel_pos_temporal=True,
        residual_pooling=True,
        dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, N, dim_in)).astype(np.float32)
    )
    variables = attn.init(jax.random.PRNGKey(0), x, (T, Hh, Ww))
    out, q_shape = attn.apply(variables, x, (T, Hh, Ww))

    p = variables["params"]
    C = dim_out // heads
    scale = C ** -0.5
    qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(B, N, 3, heads, C)
    q, k, v = (
        qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
    )  # [B, H, N, C]
    q, q_shape_ref = _pool_per_head(
        q, (T, Hh, Ww), (3, 3, 3), (1, 2, 2), p["pool_q"]["pool_kernel"],
        p["pool_q"]["norm"]["scale"], p["pool_q"]["norm"]["bias"], has_cls,
    )
    k, k_shape = _pool_per_head(
        k, (T, Hh, Ww), (3, 3, 3), (1, 3, 3), p["pool_k"]["pool_kernel"],
        p["pool_k"]["norm"]["scale"], p["pool_k"]["norm"]["bias"], has_cls,
    )
    v, _ = _pool_per_head(
        v, (T, Hh, Ww), (3, 3, 3), (1, 3, 3), p["pool_v"]["pool_kernel"],
        p["pool_v"]["norm"]["scale"], p["pool_v"]["norm"]["bias"], has_cls,
    )
    assert tuple(q_shape) == tuple(q_shape_ref)
    bias = _dense_bias(
        q, q_shape_ref, k_shape, p["rel_pos_h"], p["rel_pos_w"],
        p["rel_pos_t"], has_cls,
    )
    attn_mat = (q * scale) @ k.transpose(0, 1, 3, 2) + bias
    attn_mat = jax.nn.softmax(attn_mat, axis=-1)
    o = attn_mat @ v
    if has_cls:
        o = o.at[:, :, 1:].add(q[:, :, 1:])
    else:
        o = o + q
    o = o.transpose(0, 2, 1, 3).reshape(B, -1, dim_out)
    o = o @ p["proj"]["kernel"] + p["proj"]["bias"]

    np.testing.assert_allclose(np.asarray(out), np.asarray(o), atol=2e-4)


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
