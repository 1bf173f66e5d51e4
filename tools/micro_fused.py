"""Standalone timing of the fused block kernels vs their XLA equivalents.

Per MViTv2-S 16x4 train geometry (bs 8), times fwd and fwd+bwd of:
  - ops/mlp_block_pallas.fused_mlp_residual  vs  LN+Mlp+residual in XLA
  - ops/attn_block_pallas.fused_attn_proj    vs  reference attention+proj

Usage: python tools/micro_fused.py [mlp|attn] [block_ids...]
Prints one JSON line per case. (End-to-end ablations remain the decider —
tools/ablate.py fused_attn / fused_mlp / fused_both.)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pmv_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

B = 8

# (name, Nq(+cls), Nk(+cls), H, D, dim_out, (kt,kh,kw), C_in)
ATTN_GEOS = {
    "b0": (25089, 393, 1, 96, 96, (8, 7, 7)),
    "b1": (6273, 1569, 2, 96, 192, (8, 14, 14)),
    "b2": (6273, 393, 2, 96, 192, (8, 7, 7)),
    "b3": (1569, 1569, 4, 96, 384, (8, 14, 14)),
    "s3": (1569, 393, 4, 96, 384, (8, 7, 7)),
    "b14": (393, 1569, 8, 96, 768, (8, 14, 14)),
}
# (name, N, C, hidden)
MLP_GEOS = {
    "b0": (25089, 96, 384),
    "b1": (6273, 192, 768),
    "b3": (1569, 384, 1536),
    "b14": (393, 768, 3072),
}


def _time(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def run_mlp(name):
    n, c, hidden = MLP_GEOS[name]
    from pmv_tpu.ops.mlp_block_pallas import fits_vmem, fused_mlp_residual

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, n, c)).astype(jnp.bfloat16)
    args = (
        x, jnp.ones((c,)), jnp.zeros((c,)),
        (jax.random.normal(ks[1], (c, hidden)) * 0.05),
        jnp.zeros((hidden,)),
        (jax.random.normal(ks[2], (hidden, c)) * 0.05),
        jnp.zeros((c,)), jnp.ones((B,)),
    )

    def xla(x, ln_s, ln_b, w1, b1, w2, b2, dp):
        dt = x.dtype
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, -1, keepdims=True)
        ln = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b).astype(dt)
        h = jax.nn.gelu(jnp.dot(ln, w1.astype(dt)) + b1.astype(dt))
        return x + dp[:, None, None].astype(dt) * (
            jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
        )

    for label, f in (("pl", fused_mlp_residual), ("xla", xla)):
        if label == "pl" and not fits_vmem(c, hidden):
            print(json.dumps({"case": f"mlp:{name}:pl", "skipped": "vmem"}))
            continue
        fwd = _time(f, *args)

        def loss(*a):
            return jnp.sum(f(*a).astype(jnp.float32) ** 2)

        both = _time(jax.grad(loss, argnums=(0, 3, 5)), *args)
        print(
            json.dumps(
                {
                    "case": f"mlp:{name}:{label}",
                    "fwd_ms": round(fwd, 2),
                    "fwdbwd_ms": round(both, 2),
                }
            ),
            flush=True,
        )


def run_attn(name):
    nq, nk, h, d, dim_out, (kt, khh, kww) = ATTN_GEOS[name]
    from pmv_tpu.ops.attn_block_pallas import (
        _reference_block,
        fused_attn_proj,
    )

    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    q = jax.random.normal(ks[0], (B, nq, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, nk, h, d)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, nk, h, d)).astype(jnp.bfloat16)
    rh = (jax.random.normal(ks[3], (B, nq, h, khh)) * 0.1).astype(jnp.bfloat16)
    rw = (jax.random.normal(ks[4], (B, nq, h, kww)) * 0.1).astype(jnp.bfloat16)
    rt = (jax.random.normal(ks[5], (B, nq, h, kt)) * 0.1).astype(jnp.bfloat16)
    wp = jax.random.normal(ks[6], (h * d, dim_out)) * 0.05
    bp = jnp.zeros((dim_out,))
    args = (q, k, v, rh, rw, rt, wp, bp)
    scale = d ** -0.5
    res = d * h == dim_out
    # custom_vjp rejects keyword args: bind the static tail positionally.
    pl_f = lambda *a: fused_attn_proj(*a, scale, kt, khh, kww, True, res)
    xla_f = lambda *a: _reference_block(
        *a, scale, kt, khh, kww, True, res
    )
    for label, f in (("pl", pl_f), ("xla", xla_f)):
        fwd = _time(lambda *a: f(*a), *args)

        def loss(*a):
            return jnp.sum(f(*a).astype(jnp.float32) ** 2)

        both = _time(jax.grad(loss, argnums=(0, 1, 6)), *args)
        print(
            json.dumps(
                {
                    "case": f"attn:{name}:{label}",
                    "fwd_ms": round(fwd, 2),
                    "fwdbwd_ms": round(both, 2),
                }
            ),
            flush=True,
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:]
    if which in ("mlp", "all"):
        for n in names or MLP_GEOS:
            run_mlp(n)
    if which in ("attn", "all"):
        for n in names or ATTN_GEOS:
            run_attn(n)


if __name__ == "__main__":
    main()
