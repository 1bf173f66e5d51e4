"""Exactness of the fused sparse-KV pool kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.attention import (
    AttentionPool,
    FlatGroupLN,
    decimate_pool_windows,
)
from pmv_tpu.ops import kv_pool_pallas as kvp


def _case(B=2, thw=(4, 8, 8), C_in=16, HC=24, heads=2, stride=(1, 4, 4),
          kernel=(3, 3, 3), bias=True, seed=0):
    rng = np.random.default_rng(seed)
    T, H, W = thw
    x = rng.normal(size=(B, T * H * W, C_in)).astype(np.float32)
    g6, kv_grid = decimate_pool_windows(jnp.asarray(x), thw, kernel, stride)
    B_, Tp, Ph, kh, Pw, kw, _ = g6.shape
    z = g6.reshape(B, Tp, Ph * kh * Pw * kw, C_in)
    wk = (rng.normal(size=(C_in, HC)) * 0.1).astype(np.float32)
    wv = (rng.normal(size=(C_in, HC)) * 0.1).astype(np.float32)
    bk = (rng.normal(size=(HC,)) * 0.1).astype(np.float32) if bias else None
    bv = (rng.normal(size=(HC,)) * 0.1).astype(np.float32) if bias else None
    C = HC // heads
    pk = (rng.normal(size=kernel + (1, C)) * 0.2).astype(np.float32)
    pv = (rng.normal(size=kernel + (1, C)) * 0.2).astype(np.float32)
    ln_k = (rng.normal(size=(C,)).astype(np.float32),
            rng.normal(size=(C,)).astype(np.float32))
    ln_v = (rng.normal(size=(C,)).astype(np.float32),
            rng.normal(size=(C,)).astype(np.float32))
    return dict(
        x=x, z=jnp.asarray(z), kv_grid=kv_grid, thw=thw, wk=wk, wv=wv,
        bk=bk, bv=bv, pk=pk, pv=pv, ln_k=ln_k, ln_v=ln_v, heads=heads,
        stride=stride, kernel=kernel, HC=HC, C_in=C_in,
    )


def _reference_module_path(case):
    """The shipped unfused path: FusedQKVSplitDots-style dots + sparse
    AttentionPool (flat layout, no cls)."""
    z = case["z"]
    B, Tp, S, _ = z.shape
    kv_tokens = z.reshape(B, -1, case["C_in"])
    k = kv_tokens @ case["wk"]
    v = kv_tokens @ case["wv"]
    if case["bk"] is not None:
        k = k + case["bk"]
        v = v + case["bv"]
    kt, kh, kw = case["kernel"]
    Tp_, Ph, Pw = case["kv_grid"]

    outs = []
    for t, p, ln, bias_sl in (
        (k, case["pk"], case["ln_k"], case["bk"]),
        (v, case["pv"], case["ln_v"], case["bv"]),
    ):
        pool = AttentionPool(
            kernel=case["kernel"], stride=case["stride"], mode="conv",
            has_cls_embed=False, flat=True, heads=case["heads"],
            dtype=jnp.float32,
        )
        variables = {
            "params": {
                "pool_kernel": jnp.asarray(p),
                "norm": {"scale": jnp.asarray(ln[0]),
                         "bias": jnp.asarray(ln[1])},
            }
        }
        out, new_thw = pool.apply(
            variables, t, case["thw"], sparse_grid=case["kv_grid"],
            sparse_bias=None if bias_sl is None else jnp.asarray(bias_sl),
        )
        outs.append((np.asarray(out), new_thw))
    return outs


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("heads", [1, 2])
def test_fused_kv_pool_matches_module_path(bias, heads):
    case = _case(bias=bias, heads=heads, HC=24 if heads == 2 else 16)
    (k_ref, thw_k), (v_ref, _) = _reference_module_path(case)
    k, v = kvp.fused_kv_pool_fwd_only(
        case["z"], case["wk"], case["wv"], case["bk"], case["bv"],
        case["pk"], case["pv"], case["ln_k"], case["ln_v"],
        grid_thw=case["thw"], kernel=case["kernel"], stride=case["stride"],
        heads=case["heads"], eps=1e-6, compute_dtype=jnp.float32,
        out_dtype=jnp.float32, interpret=True,
    )
    B = case["z"].shape[0]
    T_out, Ph, Pw = thw_k
    k = np.asarray(k).reshape(B, -1, case["HC"])
    v = np.asarray(v).reshape(B, -1, case["HC"])
    assert k.shape == k_ref.shape
    np.testing.assert_allclose(k, k_ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(v, v_ref, atol=2e-5, rtol=2e-5)


def test_pooled_pre_ln_helper_matches():
    """The XLA backward helper reproduces the kernel's pre-LN pooled
    activations (used as the custom-vjp recompute reference)."""
    case = _case()
    kvalid, grid = kvp._valid_taps(
        *case["thw"], kernel=case["kernel"], stride=case["stride"]
    )
    heads, HC = case["heads"], case["HC"]
    C = HC // heads
    p_t = jnp.tile(jnp.asarray(case["pk"]).reshape(*case["kernel"], C),
                   (1, 1, 1, heads))
    pooled = kvp.pooled_pre_ln(
        case["z"], case["wk"], case["bk"], p_t, kvalid, grid,
        case["kernel"], jnp.float32,
    )
    # LN on top must equal the module path.
    ln = FlatGroupLN(heads=heads, dtype=jnp.float32)
    y = ln.apply(
        {"params": {"scale": jnp.asarray(case["ln_k"][0]),
                    "bias": jnp.asarray(case["ln_k"][1])}},
        pooled.reshape(case["z"].shape[0], -1, HC),
    )
    (k_ref, _), _ = _reference_module_path(case)
    np.testing.assert_allclose(np.asarray(y), k_ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bias", [True, False])
def test_fused_kv_custom_vjp_matches_autodiff(bias):
    """Hand-written backward vs jax.grad through the XLA reference math."""
    case = _case(bias=bias)
    params = {
        "wk": jnp.asarray(case["wk"]), "wv": jnp.asarray(case["wv"]),
        "pk": jnp.asarray(case["pk"]), "pv": jnp.asarray(case["pv"]),
        "sk": jnp.asarray(case["ln_k"][0]), "bk_ln": jnp.asarray(case["ln_k"][1]),
        "sv": jnp.asarray(case["ln_v"][0]), "bv_ln": jnp.asarray(case["ln_v"][1]),
    }
    if bias:
        params["bk"] = jnp.asarray(case["bk"])
        params["bv"] = jnp.asarray(case["bv"])
    mk = lambda use_custom: kvp.make_fused_kv_pool(  # noqa: E731
        grid_thw=case["thw"], kernel=case["kernel"], stride=case["stride"],
        heads=case["heads"], eps=1e-6, compute_dtype=jnp.float32,
        out_dtype=jnp.float32, has_bias=bias, use_pallas=False,
    )
    fused, _ = mk(True)

    def loss_custom(z, p):
        k, v = fused(z, p)
        return jnp.sum(k * k) + jnp.sum(v * jnp.sin(v))

    # Reference: same math via plain autodiff (no custom_vjp): rebuild the
    # forward with the module-level helpers.
    def loss_ref(z, p):
        heads, HC = case["heads"], case["HC"]
        kvalid, grid = kvp._valid_taps(
            *case["thw"], kernel=case["kernel"], stride=case["stride"]
        )
        C = HC // heads
        outs = []
        for t in ("k", "v"):
            p_t = jnp.tile(p[f"p{t}"].reshape(*case["kernel"], C),
                           (1, 1, 1, heads))
            pooled = kvp.pooled_pre_ln(
                z, p[f"w{t}"], p.get(f"b{t}"), p_t, kvalid, grid,
                case["kernel"], jnp.float32,
            ).reshape(z.shape[0], grid[0], grid[1] * grid[2], HC)
            y = kvp._ln_rows(
                pooled, jnp.tile(p[f"s{t}"], heads),
                jnp.tile(p[f"b{t}_ln"], heads), heads, 1e-6,
            )
            outs.append(y)
        k, v = outs
        return jnp.sum(k * k) + jnp.sum(v * jnp.sin(v))

    gz0, gp0 = jax.grad(loss_ref, argnums=(0, 1))(case["z"], params)
    gz1, gp1 = jax.grad(loss_custom, argnums=(0, 1))(case["z"], params)
    np.testing.assert_allclose(np.asarray(gz1), np.asarray(gz0),
                               atol=5e-4, rtol=5e-4)
    for name in params:
        np.testing.assert_allclose(
            np.asarray(gp1[name]), np.asarray(gp0[name]),
            atol=5e-4, rtol=5e-4, err_msg=name,
        )


def test_fused_kv_pool_module_integration():
    """TPU.FUSED_KV_POOL through MultiScaleBlock: same param tree, same
    outputs and grads as the unfused sparse path (XLA fallback on CPU)."""
    from pmv_tpu.models.attention import MultiScaleBlock

    thw = (4, 8, 8)
    dim, heads = 12, 2
    x = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(2, int(np.prod(thw)), dim)
        ).astype(np.float32)
    )

    def build(fused):
        return MultiScaleBlock(
            dim=dim, dim_out=dim, num_heads=heads, input_size=thw,
            qkv_bias=True, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
            stride_q=(1, 1, 1), stride_kv=(1, 4, 4), mode="conv",
            has_cls_embed=False, rel_pos_spatial=True,
            rel_pos_temporal=True, residual_pooling=True,
            dim_mul_in_att=True, flat_pools=True, flat_pools_max_batch=0,
            fused_kv_pool=fused, dtype=jnp.float32,
        )

    base, fused = build(False), build(True)
    params = base.init(jax.random.PRNGKey(0), x, thw)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), x, thw)
    )
    y0, s0 = base.apply(params, x, thw)
    y1, s1 = fused.apply(params, x, thw)
    assert s0 == s1
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=2e-5, rtol=2e-5)

    def loss(p, m):
        out, _ = m.apply(p, x, thw)
        return jnp.sum(out * out)

    g0 = jax.grad(loss)(params, base)
    g1 = jax.grad(loss)(params, fused)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)
