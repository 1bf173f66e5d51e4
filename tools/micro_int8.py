"""Standalone int8-vs-bf16 matmul microbench on the attached TPU.

Answers the plan-to-400 premise question directly: does an int8 MXU dot
(with and without the absmax quantize chain fused in) beat the same-shape
bf16 dot on THIS chip, at the flagship model's dense shapes? If raw int8
isn't ~2x, the W8A8 route is a backend dead end regardless of integration.

Each timing runs ITERS dot iterations INSIDE one jit (fori_loop with an
input perturbation so XLA can't CSE, and a full-output reduction so it
can't dead-code or slice-simplify the dot) — the ~3 ms/dispatch tunnel
overhead otherwise swamps these 50-500 us kernels.

Usage: python tools/micro_int8.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def int8_dot_fwd_only(x, w):
    """W8A8 absmax-quantized dot (the removed ops/quant.py forward,
    inlined here so this probe stays runnable): per-token activation
    scales, per-output-channel weight scales, int8 MXU, int32 accum."""

    def _quantize(t, axis):
        tf = t.astype(jnp.float32)
        amax = jnp.max(jnp.abs(tf), axis=axis, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(tf / scale), -127.0, 127.0).astype(jnp.int8)
        return q, scale

    xq, sx = _quantize(x, axis=-1)
    wq, sw = _quantize(w, axis=0)
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sx * sw).astype(x.dtype)

# [tokens, in] @ [in, out] — MViTv2-S stage shapes at bs8 (flat pools):
SHAPES = [
    (8 * 6272, 96, 288),    # stage-1 qkv
    (8 * 1568, 192, 576),   # stage-2 qkv
    (8 * 392, 384, 1152),   # stage-3 qkv
    (8 * 6272, 96, 384),    # stage-1 mlp up
    (8 * 1568, 192, 768),
    (8 * 392, 384, 1536),
    (8 * 392, 1536, 384),   # mlp down
]

ITERS = 50


@partial(jax.jit, static_argnames=("kind",))
def loop(x, w, kind):
    def body(i, acc):
        if x.dtype == jnp.int8:
            xi = jnp.bitwise_xor(x, i.astype(jnp.int8))
        else:
            xi = x + i.astype(x.dtype)
        if kind == "raw":
            y = jax.lax.dot_general(
                xi, w, (((1,), (0,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if x.dtype == jnp.int8 else None
                ),
            )
        else:
            y = int8_dot_fwd_only(xi, w)
        return acc + jnp.sum(y.astype(jnp.float32))

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))


def bench(x, w, kind, n=3):
    jax.device_get(loop(x, w, kind))
    t0 = time.perf_counter()
    for _ in range(n):
        out = loop(x, w, kind)
    jax.device_get(out)
    return (time.perf_counter() - t0) / (n * ITERS) * 1e3


def main():
    rng = np.random.default_rng(3)
    for (nt, k, m) in SHAPES:
        x = jnp.asarray(rng.standard_normal((nt, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, m)), jnp.bfloat16)
        xq = jnp.asarray(
            rng.integers(-127, 127, (nt, k), dtype=np.int64), jnp.int8
        )
        wq = jnp.asarray(
            rng.integers(-127, 127, (k, m), dtype=np.int64), jnp.int8
        )

        ms_bf16 = bench(x, w, "raw")
        ms_raw = bench(xq, wq, "raw")
        ms_full = bench(x, w, "quant")
        tf = 2 * nt * k * m / 1e12
        print(
            f"[{nt:6d},{k:5d}]@[{k:5d},{m:5d}]  "
            f"bf16 {ms_bf16:7.3f} ms ({tf/ms_bf16*1e3:6.1f} TF/s)  "
            f"int8-raw {ms_raw:7.3f} ({tf/ms_raw*1e3:6.1f})  "
            f"int8+quant {ms_full:7.3f} ({tf/ms_full*1e3:6.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
