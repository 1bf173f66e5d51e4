"""Sub-op timing at MViTv2-S block shapes (slope method).

Times k vs 3k independent copies inside one jit; marginal = (t3-t1)/2k.
Immune to the tunnel's per-call launch floor.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, n=10):
    jax.device_get(jax.tree.leaves(f(*a))[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def marginal(make_fn, x, k=2):
    """make_fn(xs) -> scalar; returns ms per single application."""
    def run(k):
        xs = [x * (1.0 + 0.01 * j) for j in range(k)]
        f = jax.jit(lambda *xs: sum(make_fn(xx) for xx in xs))
        return timeit(f, *xs)
    return (run(3 * k) - run(k)) / (2 * k)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # chip peak: 3 independent 4096^3 matmuls
    a = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
    ms = marginal(lambda x: jnp.sum((x @ a).astype(jnp.float32)), a, k=2)
    results["indep_4096^3"] = f"{ms:.3f} ms -> {2*4096**3/ms/1e9:.0f} TF/s"

    # block0/1 qkv: [8*25089, 96] @ [96, 288]
    x = jnp.asarray(rng.normal(size=(8 * 25089, 96)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(96, 288)), jnp.bfloat16)
    ms = marginal(lambda x: jnp.sum((x @ w).astype(jnp.float32)), x, k=2)
    results["qkv_s1"] = f"{ms:.3f} ms -> {2*x.shape[0]*96*288/ms/1e9:.0f} TF/s"

    # block4 qkv: [8*1569, 384] @ [384, 1152]
    x4 = jnp.asarray(rng.normal(size=(8 * 1569, 384)), jnp.bfloat16)
    w4 = jnp.asarray(rng.normal(size=(384, 1152)), jnp.bfloat16)
    ms = marginal(lambda x: jnp.sum((x @ w4).astype(jnp.float32)), x4, k=4)
    results["qkv_s3"] = f"{ms:.3f} ms -> {2*x4.shape[0]*384*1152/ms/1e9:.0f} TF/s"

    # block4 mlp fc1: [8*1569, 384] @ [384, 1536]
    w5 = jnp.asarray(rng.normal(size=(384, 1536)), jnp.bfloat16)
    ms = marginal(lambda x: jnp.sum((x @ w5).astype(jnp.float32)), x4, k=4)
    results["mlp1_s3"] = f"{ms:.3f} ms -> {2*x4.shape[0]*384*1536/ms/1e9:.0f} TF/s"

    # LayerNorm at stage1: [8, 25089, 96]
    xl = jnp.asarray(rng.normal(size=(8, 25089, 96)), jnp.bfloat16)
    def ln(x):
        m = x.astype(jnp.float32)
        mu = m.mean(-1, keepdims=True)
        v = ((m - mu) ** 2).mean(-1, keepdims=True)
        return jnp.sum(((m - mu) * jax.lax.rsqrt(v + 1e-6)).astype(jnp.bfloat16).astype(jnp.float32))
    ms = marginal(ln, xl, k=2)
    results["ln_s1"] = f"{ms:.3f} ms -> {2*xl.size*2/ms/1e6:.0f} GB/s"

    # attention QK^T at block0: [8,1,25089,96] x [8,1,393,96]
    q = jnp.asarray(rng.normal(size=(8, 1, 25089, 96)), jnp.bfloat16)
    kk = jnp.asarray(rng.normal(size=(8, 1, 393, 96)), jnp.bfloat16)
    def qkt(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kk)
        return jnp.sum(s.astype(jnp.float32))
    ms = marginal(qkt, q, k=2)
    results["qkt_b0"] = f"{ms:.3f} ms -> {2*8*25089*393*96/ms/1e9:.0f} TF/s"

    # full softmax(QK^T+bias)@V at block0 (XLA path)
    v = jnp.asarray(rng.normal(size=(8, 1, 393, 96)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(8, 1, 25089, 393)), jnp.bfloat16)
    def attn(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kk) + bias
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return jnp.sum(o.astype(jnp.float32))
    ms = marginal(attn, q, k=1)
    results["attn_xla_b0"] = f"{ms:.3f} ms"

    # rel-pos bias construction at block0 (einsum + repeat/tile)
    from pmv_tpu.models.attention import rel_pos_spatial_bias, rel_pos_temporal_bias
    rh = jnp.asarray(rng.normal(size=(111, 96)), jnp.bfloat16)
    rt = jnp.asarray(rng.normal(size=(15, 96)), jnp.bfloat16)
    def bias_fn(q):
        qn = q.transpose(0, 2, 1, 3)  # module layout is [B, N, heads, C]
        b = rel_pos_spatial_bias(qn, (8, 56, 56), (8, 7, 7), rh, rh, True)
        b = b + rel_pos_temporal_bias(qn, (8, 56, 56), (8, 7, 7), rt, True)
        return jnp.sum(b.astype(jnp.float32))
    ms = marginal(bias_fn, q, k=1)
    results["relpos_bias_b0"] = f"{ms:.3f} ms"

    # pool conv (XLA depthwise, stage1 q): [8,8,56,56,96]
    xc = jnp.asarray(rng.normal(size=(8, 8, 56, 56, 96)), jnp.bfloat16)
    wc = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 96)), jnp.bfloat16)
    def pool(x):
        y = jax.lax.conv_general_dilated(
            x, wc, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=96)
        return jnp.sum(y.astype(jnp.float32))
    ms = marginal(pool, xc, k=2)
    results["poolconv_s1"] = f"{ms:.3f} ms"

    for k, v in results.items():
        print(json.dumps({k: v}), flush=True)


if __name__ == "__main__":
    main()
