"""rel-pos bias: layout-optimized construction vs naive dense reference."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.attention import (
    interpolate_rel_pos,
    rel_pos_spatial_bias,
    rel_pos_temporal_bias,
)


def _naive_spatial(q, q_shape, k_shape, rel_pos_h, rel_pos_w, has_cls):
    """Direct 8-D broadcast construction (the reference formula,
    `attention.py:67-117`)."""
    sp_idx = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    dh = int(2 * max(q_h, k_h) - 1)
    dw = int(2 * max(q_w, k_w) - 1)
    q_h_ratio = max(k_h / q_h, 1.0)
    k_h_ratio = max(q_h / k_h, 1.0)
    dist_h = (
        np.arange(q_h)[:, None] * q_h_ratio - np.arange(k_h)[None, :] * k_h_ratio
    ) + (k_h - 1) * k_h_ratio
    q_w_ratio = max(k_w / q_w, 1.0)
    k_w_ratio = max(q_w / k_w, 1.0)
    dist_w = (
        np.arange(q_w)[:, None] * q_w_ratio - np.arange(k_w)[None, :] * k_w_ratio
    ) + (k_w - 1) * k_w_ratio
    Rh = interpolate_rel_pos(rel_pos_h, dh)[dist_h.astype(int)]
    Rw = interpolate_rel_pos(rel_pos_w, dw)[dist_w.astype(int)]
    B, n_head, _, dim = q.shape
    r_q = q[:, :, sp_idx:].reshape(B, n_head, q_t, q_h, q_w, dim)
    rel_h = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh)
    rel_w = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw)
    bias = (
        rel_h[:, :, :, :, :, None, :, None]
        + rel_w[:, :, :, :, :, None, None, :]
    )
    bias = jnp.broadcast_to(
        bias, (B, n_head, q_t, q_h, q_w, k_t, k_h, k_w)
    ).reshape(B, n_head, q_t * q_h * q_w, k_t * k_h * k_w)
    if sp_idx:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))
    return bias


def test_spatial_bias_matches_naive():
    rng = jax.random.PRNGKey(0)
    q_shape, k_shape = (2, 4, 3), (2, 2, 2)
    for has_cls in (True, False):
        n = int(np.prod(q_shape)) + (1 if has_cls else 0)
        q = jax.random.normal(rng, (2, 3, n, 8))
        rel_h = jax.random.normal(jax.random.PRNGKey(1), (2 * 4 - 1, 8))
        rel_w = jax.random.normal(jax.random.PRNGKey(2), (2 * 3 - 1, 8))
        fast = rel_pos_spatial_bias(
            q.transpose(0, 2, 1, 3), q_shape, k_shape, rel_h, rel_w, has_cls
        )  # module layout is [B, N, heads, C]
        naive = _naive_spatial(q, q_shape, k_shape, rel_h, rel_w, has_cls)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(naive), atol=1e-5
        )


def test_temporal_bias_matches_naive():
    rng = jax.random.PRNGKey(0)
    q_shape, k_shape = (3, 2, 2), (3, 2, 2)
    for has_cls in (True, False):
        n = int(np.prod(q_shape)) + (1 if has_cls else 0)
        q = jax.random.normal(rng, (2, 2, n, 8))
        rel_t = jax.random.normal(jax.random.PRNGKey(1), (2 * 3 - 1, 8))
        fast = rel_pos_temporal_bias(
            q.transpose(0, 2, 1, 3), q_shape, k_shape, rel_t, has_cls
        )
        # Naive: broadcast over kh, kw.
        sp = 1 if has_cls else 0
        q_t, q_h, q_w = q_shape
        k_t, k_h, k_w = k_shape
        r_q = q[:, :, sp:].reshape(2, 2, q_t, q_h, q_w, 8)
        dist_t = (np.arange(q_t)[:, None] - np.arange(k_t)[None, :]) + (k_t - 1)
        Rt = interpolate_rel_pos(rel_t, 2 * 3 - 1)[dist_t.astype(int)]
        rel = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt)
        naive = jnp.broadcast_to(
            rel[:, :, :, :, :, :, None, None],
            (2, 2, q_t, q_h, q_w, k_t, k_h, k_w),
        ).reshape(2, 2, q_t * q_h * q_w, k_t * k_h * k_w)
        if sp:
            naive = jnp.pad(naive, ((0, 0), (0, 0), (1, 0), (1, 0)))
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(naive), atol=1e-5
        )
