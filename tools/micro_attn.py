"""Micro-bench: fused Pallas attention vs the XLA extended-matmul path.

Runs the exact block geometries of MViTv2-S 16x4 @ 224 (bs 8) and times
fwd and fwd+bwd for both lowerings. Ground truth for FUSED_ATTENTION_MIN_Q
and the use_pallas default.

Usage: python tools/micro_attn.py [geom ...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pmv_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.ops.attention_pallas import (
    _expansion_matrix,
    fused_rel_attention,
)

# name: (B, H, D, nq (incl cls), (kt,kh,kw)_q grid, (kt,kh,kw)_k grid)
GEOMS = {
    "b0": (8, 1, 96, 25089, (8, 56, 56), (8, 7, 7)),
    "b1": (8, 2, 96, 6273, (8, 28, 28), (8, 14, 14)),
    "b2": (8, 2, 96, 6273, (8, 28, 28), (8, 7, 7)),
    "b3": (8, 4, 96, 1569, (8, 14, 14), (8, 14, 14)),
    "s3": (8, 4, 96, 1569, (8, 14, 14), (8, 7, 7)),
    "b14": (8, 8, 96, 393, (8, 7, 7), (8, 14, 14)),
}


def xla_path(q, k, v, rh, rw, rt, scale, kt, kh, kw):
    """The extended-matmul lowering from models/attention.py."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    tables = [rh, rw] + ([rt] if rt is not None else [])
    rcat = jnp.concatenate(tables, axis=-1)
    E, _ = _expansion_matrix(kt, kh, kw, nk, nk, True, rt is not None)
    q_ext = jnp.concatenate([q * scale, rcat.astype(q.dtype)], axis=-1)
    e_bh = jnp.broadcast_to(
        jnp.asarray(E.T, q.dtype)[None, :, None, :], (b, nk, h, E.shape[0])
    )
    k_ext = jnp.concatenate([k, e_bh], axis=-1)
    attn = jnp.einsum("bqhc,bkhc->bhqk", q_ext, k_ext)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bkhc->bqhc", attn, v)


def bench(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    names = sys.argv[1:] or list(GEOMS)
    rng = np.random.default_rng(0)
    for name in names:
        b, h, d, nq, qg, kg = GEOMS[name]
        kt, kh, kw = kg
        nk = kt * kh * kw + 1
        scale = d ** -0.5
        mk = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32), jnp.bfloat16
        )
        q = mk(b, nq, h, d)
        k = mk(b, nk, h, d)
        v = mk(b, nk, h, d)
        rh = mk(b, nq, h, kh) * 0.1
        rw = mk(b, nq, h, kw) * 0.1
        rt = mk(b, nq, h, kt) * 0.1
        args = (q, k, v, rh, rw, rt)

        f_pl = jax.jit(
            lambda *a: fused_rel_attention(*a, scale, kt, kh, kw, True)
        )
        f_xla = jax.jit(lambda *a: xla_path(*a, scale, kt, kh, kw))

        def make_grad(f):
            def loss(*a):
                return jnp.sum(f(*a).astype(jnp.float32) ** 2)

            return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))

        g_pl = make_grad(
            lambda *a: fused_rel_attention(*a, scale, kt, kh, kw, True)
        )
        g_xla = make_grad(lambda *a: xla_path(*a, scale, kt, kh, kw))

        o_pl = np.asarray(f_pl(*args), np.float32)
        o_xla = np.asarray(f_xla(*args), np.float32)
        err = np.max(np.abs(o_pl - o_xla))
        t = {}
        t["fwd_pl"] = bench(f_pl, args)
        t["fwd_xla"] = bench(f_xla, args)
        try:
            t["bwd_pl"] = bench(g_pl, args, iters=10)
        except Exception:
            t["bwd_pl"] = float("nan")  # e.g. scoped-VMEM OOM (bwd_fits_vmem)
        t["bwd_xla"] = bench(g_xla, args, iters=10)
        print(
            f"{name}: B{b} H{h} Nq{nq} Nk{nk} | "
            f"fwd pl {t['fwd_pl']:.2f} xla {t['fwd_xla']:.2f} | "
            f"fwd+bwd pl {t['bwd_pl']:.2f} xla {t['bwd_xla']:.2f} | "
            f"maxerr {err:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
