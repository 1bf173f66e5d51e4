"""Tiny standalone executions of the fused kernels on the real TPU.
Usage: python /tmp/kernel_smoke.py [mlp|attn]"""
import sys

import jax
import jax.numpy as jnp

which = sys.argv[1] if len(sys.argv) > 1 else "attn"

if which == "mlp":
    from pmv_tpu.ops.mlp_block_pallas import fused_mlp_residual

    B, N, C, H = 2, 256, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, N, C), jnp.float32).astype(jnp.bfloat16)
    args = (
        x, jnp.ones((C,)), jnp.zeros((C,)),
        (jax.random.normal(ks[1], (C, H)) * 0.05).astype(jnp.float32),
        jnp.zeros((H,)),
        (jax.random.normal(ks[2], (H, C)) * 0.05).astype(jnp.float32),
        jnp.zeros((C,)), jnp.ones((B,)),
    )
    y = fused_mlp_residual(*args)
    print("fwd", float(jnp.sum(y.astype(jnp.float32))))
    g = jax.grad(
        lambda *a: jnp.sum(fused_mlp_residual(*a).astype(jnp.float32) ** 2),
        argnums=(0, 3),
    )(*args)
    print("bwd", float(jnp.sum(g[0].astype(jnp.float32))))
else:
    from pmv_tpu.ops.attn_block_pallas import fused_attn_proj

    B, Nq, H, D, Dout = 2, 512, 2, 96, 192
    kt, kh, kw = 2, 3, 3
    nk = kt * kh * kw + 1
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (B, Nq, H, D)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, nk, H, D)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, nk, H, D)).astype(jnp.bfloat16)
    rh = (jax.random.normal(ks[3], (B, Nq, H, kh)) * 0.1).astype(jnp.bfloat16)
    rw = (jax.random.normal(ks[4], (B, Nq, H, kw)) * 0.1).astype(jnp.bfloat16)
    rt = (jax.random.normal(ks[5], (B, Nq, H, kt)) * 0.1).astype(jnp.bfloat16)
    wp = (jax.random.normal(ks[6], (H * D, Dout)) * 0.05).astype(jnp.float32)
    bp = jnp.zeros((Dout,))
    args = (q, k, v, rh, rw, rt, wp, bp)
    y = fused_attn_proj(*args, D ** -0.5, kt, kh, kw, True, True)
    print("fwd", float(jnp.sum(y.astype(jnp.float32))))
    g = jax.grad(
        lambda *a: jnp.sum(
            fused_attn_proj(
                *a, D ** -0.5, kt, kh, kw, True, True
            ).astype(jnp.float32) ** 2
        ),
        argnums=(0, 6),
    )(*args)
    print("bwd", float(jnp.sum(g[0].astype(jnp.float32))))
print("SMOKE_OK", which)
