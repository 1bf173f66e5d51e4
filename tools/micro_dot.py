"""MXU-utilization study of the flagship dense shapes (VERDICT r4 #2).

micro_int8 measured raw bf16 dots at 10-18 TF/s (5-9% of v5e peak) at the
model's shapes and nobody asked why. This sweep separates three regimes
per [M,K]@[K,N] shape:

  hot    — operands stay VMEM-resident across iterations (x and w fit),
           output sum-reduced: measures the MXU+pipeline ceiling alone.
  stream — a fresh x slice is pulled from HBM every iteration
           (dynamic-slice over an [ITERS, M, K] stack), output reduced:
           measures the read-streaming rate the model's dots live under.
  +out   — stream plus a materialized [M, N] output accumulator
           (acc += y): adds the write/readback stream of a real layer.

Each row prints measured ms and TF/s next to the shape's own roofline
(max of MXU time and HBM time for the bytes that regime actually moves)
and the efficiency against it. If `stream` sits at its roofline, the dots
are memory-bound-by-shape and byte-cutting is the only lever; if it sits
well below, XLA's dot lowering is leaving bandwidth on the floor and a
layout/padding fix has headroom.

Usage: python tools/micro_dot.py [quick]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pmv_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

V5E_BW = 819e9
V5E_PEAK = 197e12

ITERS = 32


@jax.jit
def loop_hot(x, w):
    def body(i, acc):
        wi = w + i.astype(w.dtype)  # perturb the SMALL operand (no CSE)
        y = jax.lax.dot_general(x, wi, (((1,), (0,)), ((), ())))
        return acc + jnp.sum(y.astype(jnp.float32))

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))


@jax.jit
def loop_stream(xs, w):
    def body(i, acc):
        x = jax.lax.dynamic_index_in_dim(xs, i, axis=0, keepdims=False)
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())))
        return acc + jnp.sum(y.astype(jnp.float32))

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))


@jax.jit
def loop_stream_out(xs, w, acc0):
    def body(i, acc):
        x = jax.lax.dynamic_index_in_dim(xs, i, axis=0, keepdims=False)
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())))
        return acc + y

    return jax.lax.fori_loop(0, ITERS, body, acc0)


def _time(fn, *args, n=3):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / (n * ITERS) * 1e3


def row(m, k, n, tag="", stream_only=False):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    flops = 2 * m * k * n
    mxu_ms = flops / V5E_PEAK * 1e3

    def _fmt(ms, bytes_):
        tf = flops / ms * 1e3 / 1e12
        bound = max(bytes_ / V5E_BW * 1e3, mxu_ms)
        return f"{ms:7.3f}ms {tf:6.1f}TF/s eff{bound / ms * 100:4.0f}%"

    cols = []
    if not stream_only:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        ms = _time(loop_hot, x, w)
        cols.append("hot " + _fmt(ms, 2 * k * n))  # only w' round trip
        del x
    xs_bytes = ITERS * m * k * 2
    if xs_bytes < 3e9:
        xs = jnp.asarray(
            rng.standard_normal((ITERS, m, k)).astype(np.float32), jnp.bfloat16
        )
        ms = _time(loop_stream, xs, w)
        cols.append("stream " + _fmt(ms, 2 * m * k))
        acc0 = jnp.zeros((m, n), jnp.bfloat16)
        # acc += y: x read + acc read/write (y fuses into the add).
        ms = _time(loop_stream_out, xs, w, acc0)
        cols.append("+out " + _fmt(ms, 2 * (m * k + 2 * m * n)))
        del xs
    print(f"[{m:6d},{k:5d}]@[{k:5d},{n:5d}] {tag:10s} " + " | ".join(cols),
          flush=True)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print(f"# device: {jax.devices()[0]}, iters={ITERS}")
    print("# --- flagship geometries (bs8 flat tokens) ---")
    flagship = [
        (8 * 6273, 96, 288, "s1 qkv"),
        (8 * 6273, 96, 384, "s1 fc1"),
        (8 * 6273, 384, 96, "s1 fc2"),
        (8 * 6273, 192, 576, "s2 qkv"),
        (8 * 1569, 384, 1152, "s3 qkv"),
        (8 * 1569, 384, 1536, "s3 fc1"),
        (8 * 1569, 1536, 384, "s3 fc2"),
        (8 * 393, 768, 3072, "s4 fc1"),
    ]
    for m, k, n, tag in flagship:
        row(m, k, n, tag)
    if quick:
        return
    print("# --- K sweep, M=50184 N=384 (lane-padding question) ---")
    for k in (96, 128, 192, 256, 384, 512, 768, 1536):
        row(8 * 6273, k, 384, f"k={k}")
    print("# --- N sweep, M=50184 K=384 ---")
    for n in (96, 128, 256, 384, 512, 768, 1536):
        row(8 * 6273, 384, n, f"n={n}")
    print("# --- M sweep, K=384 N=1536 ---")
    for m in (392, 1569, 3136, 12552, 50184):
        row(m, 384, 1536, f"m={m}")
    print("# --- big square sanity (should near peak in hot) ---")
    row(4096, 4096, 4096, "square4k")
    row(2048, 2048, 2048, "square2k")


if __name__ == "__main__":
    main()
