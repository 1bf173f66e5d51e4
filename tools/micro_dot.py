"""MXU-utilization study of the flagship dense shapes (VERDICT r4 #2).

micro_int8 measured raw bf16 dots at 10-18 TF/s (5-9% of v5e peak) at the
model's shapes and nobody asked why. Round-5 finding: that number (and the
first run of this sweep at ITERS=32) was dominated by the tunneled
backend's per-dispatch floor (~4-10 ms/call); amortized over 32 loop
iterations that floor alone reads as ~0.3 ms/dot = 10-45 TF/s at these
shapes. This harness is therefore SELF-CALIBRATING: each regime runs the
same fori_loop at two trip counts and reports the marginal per-iteration
time (t_hi - t_lo) / (hi - lo), which cancels every fixed per-call cost
(dispatch, tunnel latency, output fetch).

Regimes per [M,K]@[K,N] shape:

  hot    — operands stay VMEM-resident across iterations (x and w fit),
           output sum-reduced: measures the MXU+pipeline ceiling alone.
  stream — a fresh x slice is pulled from HBM every iteration (modulo
           index over an [NSLICES, M, K] stack), output reduced:
           measures the read-streaming rate the model's dots live under.
  +out   — stream plus a materialized [M, N] output accumulator
           (acc += y): adds the write/readback stream of a real layer.

Each row prints marginal ms and TF/s next to the shape's own roofline
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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BW = 819e9
V5E_PEAK = 197e12

LO, HI = 64, 1024  # marginal window: (t_hi - t_lo) / (HI - LO)
NSLICES = 32      # stream stack depth (modulo-indexed)


@jax.jit
def loop_hot(x, w, iters):
    def body(i, acc):
        wi = w + i.astype(w.dtype)  # perturb the SMALL operand (no CSE)
        y = jax.lax.dot_general(x, wi, (((1,), (0,)), ((), ())))
        return acc + jnp.sum(y.astype(jnp.float32))

    return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))


@jax.jit
def loop_stream(xs, w, iters):
    def body(i, acc):
        x = jax.lax.dynamic_index_in_dim(
            xs, jax.lax.rem(i, xs.shape[0]), axis=0, keepdims=False
        )
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())))
        return acc + jnp.sum(y.astype(jnp.float32))

    return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))


@jax.jit
def loop_stream_out(xs, w, acc0, iters):
    def body(i, acc):
        x = jax.lax.dynamic_index_in_dim(
            xs, jax.lax.rem(i, xs.shape[0]), axis=0, keepdims=False
        )
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())))
        return acc + y

    return jax.lax.fori_loop(0, iters, body, acc0)


def _sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _call_ms(fn, n=3):
    _sync(fn())  # warm (compile both trip counts before timing)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best  # min-of-n: tunnel-call jitter is one-sided


def _marginal_ms(fn_of_iters):
    # Dynamic trip count: one executable serves both trip counts, and the
    # difference cancels every fixed per-call cost (dispatch, tunnel,
    # output fetch) — see the module docstring.
    t_lo = _call_ms(lambda: fn_of_iters(jnp.int32(LO)))
    t_hi = _call_ms(lambda: fn_of_iters(jnp.int32(HI)))
    return (t_hi - t_lo) / (HI - LO)


def row(m, k, n, tag="", dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, n)), dtype)
    flops = 2 * m * k * n
    mxu_ms = flops / V5E_PEAK * 1e3

    def _fmt(ms, bytes_):
        tf = flops / ms * 1e3 / 1e12
        bound = max(bytes_ / V5E_BW * 1e3, mxu_ms)
        return f"{ms:7.4f}ms {tf:6.1f}TF/s eff{min(999, bound / ms * 100):4.0f}%"

    cols = []
    x = jnp.asarray(rng.standard_normal((m, k)), dtype)
    ms = _marginal_ms(lambda it: loop_hot(x, w, it))
    cols.append("hot " + _fmt(ms, 2 * k * n))  # only w' round trip
    del x
    xs = jnp.asarray(
        rng.standard_normal((NSLICES, m, k)).astype(np.float32), dtype
    )
    ms = _marginal_ms(lambda it: loop_stream(xs, w, it))
    esize = jnp.dtype(dtype).itemsize
    cols.append("stream " + _fmt(ms, esize * m * k))
    acc0 = jnp.zeros((m, n), dtype)
    # acc += y: x read + acc read/write (y fuses into the add).
    ms = _marginal_ms(lambda it: loop_stream_out(xs, w, acc0, it))
    cols.append("+out " + _fmt(ms, esize * (m * k + 2 * m * n)))
    del xs
    print(f"[{m:6d},{k:5d}]@[{k:5d},{n:5d}] {tag:10s} " + " | ".join(cols),
          flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "focus":
        # Trimmed round-5 set: the s4 row, the K=96-vs-128 lane-padding
        # question for stage 1, and the square sanity rows.
        row(8 * 393, 768, 3072, "s4 fc1")
        row(8 * 6273, 96, 384, "k=96")
        row(8 * 6273, 128, 384, "k=128")
        row(8 * 6273, 96, 128, "n=96->128")
        row(2048, 2048, 2048, "square2k")
        row(4096, 4096, 4096, "square4k")
        return
    quick = mode == "quick"
    print(f"# device: {jax.devices()[0]}, marginal over iters {LO}->{HI}")
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
