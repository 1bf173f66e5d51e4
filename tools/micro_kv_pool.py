"""Standalone on-chip probe of the fused sparse-KV Pallas kernel.

Separates "the kernel itself fails to compile on this backend" from "the
full train graph + kernel trips the remote-compile-helper 500" (the same
signature as the flat-bs32 failures — ROADMAP round-3/4).

Usage: python tools/micro_kv_pool.py [block]   # block in {0, 1}
Prints timing for the kernel fwd and fwd+bwd vs the unfused XLA path at
the MViTv2-S block geometry.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pmv_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.attention import decimate_pool_windows
from pmv_tpu.ops import kv_pool_pallas as kvp

# (thw, C_in, HC, heads, stride) for MViTv2-S sparse blocks at 224x224.
GEOMS = {
    "0": ((8, 56, 56), 96, 96, 1, (1, 8, 8)),
    "1": ((8, 56, 56), 96, 192, 2, (1, 4, 4)),
    "2": ((8, 28, 28), 192, 192, 2, (1, 4, 4)),
}
B = 8
KERNEL = (3, 3, 3)


def timeit(f, *a, n=10):
    out = f(*a)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "0"
    thw, C_in, HC, heads, stride = GEOMS[which]
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(B, int(np.prod(thw)), C_in)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    g6, kv_grid = decimate_pool_windows(x, thw, KERNEL, stride)
    z = g6.reshape(B, g6.shape[1], -1, C_in)
    C = HC // heads
    params = {
        "wk": jnp.asarray(rng.normal(size=(C_in, HC)).astype(np.float32) * 0.1),
        "wv": jnp.asarray(rng.normal(size=(C_in, HC)).astype(np.float32) * 0.1),
        "bk": jnp.zeros((HC,), jnp.float32),
        "bv": jnp.zeros((HC,), jnp.float32),
        "pk": jnp.asarray(
            rng.normal(size=KERNEL + (1, C)).astype(np.float32) * 0.2),
        "pv": jnp.asarray(
            rng.normal(size=KERNEL + (1, C)).astype(np.float32) * 0.2),
        "sk": jnp.ones((C,), jnp.float32),
        "bk_ln": jnp.zeros((C,), jnp.float32),
        "sv": jnp.ones((C,), jnp.float32),
        "bv_ln": jnp.zeros((C,), jnp.float32),
    }

    for use_pallas, tag in ((True, "pallas"), (False, "xla")):
        fused, _ = kvp.make_fused_kv_pool(
            grid_thw=thw, kernel=KERNEL, stride=stride, heads=heads,
            eps=1e-6, compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
            has_bias=True, use_pallas=use_pallas,
        )
        try:
            fwd = jax.jit(lambda z_, p_: fused(z_, p_))
            ms_f = timeit(fwd, z, params)

            def loss(z_, p_):
                k, v = fused(z_, p_)
                return (jnp.sum(k.astype(jnp.float32) ** 2)
                        + jnp.sum(v.astype(jnp.float32) ** 2))

            bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
            ms_b = timeit(bwd, z, params)
            print(f"block{which} {tag}: fwd {ms_f:.2f} ms  fwd+bwd {ms_b:.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"block{which} {tag}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
