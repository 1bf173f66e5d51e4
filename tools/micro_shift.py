"""Micro-bench: depthwise pool variants at the real MViTv2-S pool shapes.

Variants: XLA grouped conv (current default), dw_shifted (lane-padded
shifted-MAC, f32 accum), dw_shifted bf16 accum, pool_conv (XLA fwd +
custom-vjp bwd). Times fwd and fwd+bwd per op, chained K deep inside one
jit (tunnel-safe; dispatch amortized).

Usage: python tools/micro_shift.py [case_idx ...]
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

from pmv_tpu.ops import pool_conv as pcm

K = 8

# (B, T, H, W, HC, stride, count) — every pool conv in MViTv2-S 16x4 @ bs 8,
# heads folded into channels; count = how many times that exact op runs
# per forward.
CASES = [
    (8, 8, 56, 56, 96, (1, 1, 1), 1),   # b0 q
    (8, 8, 56, 56, 96, (1, 8, 8), 2),   # b0 k,v
    (8, 8, 56, 56, 192, (1, 2, 2), 1),  # b1 q
    (8, 8, 56, 56, 192, (1, 4, 4), 2),  # b1 k,v
    (8, 8, 28, 28, 192, (1, 1, 1), 1),  # b2 q
    (8, 8, 28, 28, 192, (1, 4, 4), 2),  # b2 k,v
    (8, 8, 28, 28, 384, (1, 2, 2), 3),  # b3 q,k,v
    (8, 8, 14, 14, 384, (1, 1, 1), 10),  # b4-13 q
    (8, 8, 14, 14, 384, (1, 2, 2), 20),  # b4-13 k,v
    (8, 8, 14, 14, 768, (1, 2, 2), 1),  # b14 q
    (8, 8, 14, 14, 768, (1, 1, 1), 2),  # b14 k,v
    (8, 8, 7, 7, 768, (1, 1, 1), 3),    # b15 q,k,v
]

PAD = [(1, 1), (1, 1), (1, 1)]


def xla_dw(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w.reshape((3, 3, 3, 1, -1)), stride, PAD,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=w.shape[-1],
    )


def variants(stride):
    return {
        "xla": lambda x, w: xla_dw(x, w, stride),
        "shift": lambda x, w: pcm.dw_shifted(x, w, stride, PAD),
        "shift_bf16": lambda x, w: pcm.dw_shifted(
            x, w, stride, PAD, accum_dtype=jnp.bfloat16
        ),
        "custom_vjp": lambda x, w: pcm.pool_conv(
            x, w.reshape((3, 3, 3, 1, -1)), stride, PAD
        ),
    }


def chain_fwd(f, x, w):
    def body(i, acc):
        out = f(x * (1.0 + 0.001 * i.astype(x.dtype)), w)
        return acc + jnp.sum(out.astype(jnp.float32))

    return jax.lax.fori_loop(0, K, body, jnp.array(0.0, jnp.float32))


def chain_fb(f, x, w, g):
    def body(i, carry):
        acc, wa = carry
        out, vjp = jax.vjp(f, x * (1.0 + 0.001 * i.astype(x.dtype)), wa)
        dx, dw = vjp((g * (1.0 + 0.001 * i.astype(g.dtype))).astype(out.dtype))
        return (
            acc + jnp.sum(dx.astype(jnp.float32)),
            wa + dw.reshape(wa.shape).astype(wa.dtype) * 1e-6,
        )

    acc, wf = jax.lax.fori_loop(
        0, K, body, (jnp.array(0.0, jnp.float32), w)
    )
    return acc + jnp.sum(wf.astype(jnp.float32))


def timed(fn, *args, n=5):
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.device_get(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3 / K


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    idxs = [int(a) for a in sys.argv[1:]] or range(len(CASES))
    totals = {}
    for ci in idxs:
        b, t, h, wd, hc, stride, count = CASES[ci]
        x = jnp.asarray(rng.normal(size=(b, t, h, wd, hc)), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, hc)) * 0.1, dt)
        st, sh, sw = stride
        oshape = (b, -(-t // st), -(-h // sh), -(-wd // sw), hc)
        g = jnp.asarray(rng.normal(size=oshape), dt)
        r = {}
        for name, f in variants(stride).items():
            try:
                r[f"{name}_fwd"] = timed(
                    jax.jit(functools.partial(chain_fwd, f)), x, w
                )
                r[f"{name}_fb"] = timed(
                    jax.jit(functools.partial(chain_fb, f)), x, w, g
                )
            except Exception as e:
                r[f"{name}_err"] = str(e)[:80]
        for k, v in r.items():
            if isinstance(v, float):
                totals[k] = totals.get(k, 0.0) + v * count
        print(
            json.dumps(
                {"case": ci, "shape": [b, t, h, wd, hc],
                 "stride": list(stride), "count": count,
                 **{k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in r.items()}}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {"total_weighted_ms": {k: round(v, 2) for k, v in totals.items()}}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
