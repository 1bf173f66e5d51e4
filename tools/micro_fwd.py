"""Forward hot-spot attribution at real MViTv2-S 16x4 shapes (bs 8).

jax.profiler hangs over the tunneled backend, so the forward is attributed
by timing each constituent op in isolation at the exact stage-1/2 shapes.
Prints one JSON line per op.

Usage: python tools/micro_fwd.py [op ...]
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

B = 8
DT = jnp.bfloat16


INNER = 24


def timeit(f, *a, n=4):
    """Time f amortized over INNER serialized in-jit iterations.

    The tunneled backend has a ~3 ms per-dispatch floor, so the op runs in
    a fori_loop whose input is perturbed by the previous output (defeats
    CSE, keeps shapes fixed) — one dispatch covers INNER evaluations.
    """
    x0 = a[0]
    rest = a[1:]

    def body(i, carry):
        x, c = carry
        out = f(x * (1.0 + c * 1e-24).astype(x.dtype), *rest)
        first = jax.tree.leaves(out)[0]
        c2 = first.ravel()[0].astype(jnp.float32)
        return (x, c2)

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, INNER, body, (x, jnp.float32(0.0)))

    out = loop(x0)
    jax.device_get(out[1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = loop(x0)
    jax.device_get(out[1])
    return (time.perf_counter() - t0) / (n * INNER) * 1e3


def rnd(shape, dtype=DT, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), dtype
    )


# ---- stage-1 geometry (block 0): grid 8x56x56, dim 96, heads 1
N1 = 8 * 56 * 56 + 1
# ---- block 1: dim 96 -> 192, heads 2, q pool (1,2,2), kv (1,4,4)
N2 = 8 * 28 * 28 + 1


def op_ln():
    import flax.linen as nn

    m = nn.LayerNorm(epsilon=1e-6, dtype=DT)
    x = rnd((B, N1, 96))
    p = m.init(jax.random.PRNGKey(0), x)
    f = lambda x: m.apply(p, x)  # noqa: E731
    return timeit(f, x)


def op_dense_qkv():
    x = rnd((B, N1, 96))
    w = rnd((96, 288))
    f = jax.jit(lambda x, w: jnp.einsum("bnc,cd->bnd", x, w))
    return timeit(f, x, w)


def op_mlp():
    x = rnd((B, N1, 96))
    w1, w2 = rnd((96, 384)), rnd((384, 96))
    f = jax.jit(
        lambda x, w1, w2: jnp.einsum(
            "bnd,dc->bnc", jax.nn.gelu(jnp.einsum("bnc,cd->bnd", x, w1)), w2
        )
    )
    return timeit(f, x, w1, w2)


def _dw_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=w.shape[-1],
    )


def op_pool_q():  # stride-1 3x3x3 depthwise at full grid, C=96
    x = rnd((B, 8, 56, 56, 96))
    w = rnd((3, 3, 3, 1, 96))
    f = jax.jit(lambda x, w: _dw_conv(x, w, (1, 1, 1)))
    return timeit(f, x, w)


def op_pool_q_pad128():  # padded to 128 lanes
    x = rnd((B, 8, 56, 56, 128))
    w = rnd((3, 3, 3, 1, 128))
    f = jax.jit(lambda x, w: _dw_conv(x, w, (1, 1, 1)))
    return timeit(f, x, w)


def op_pool_kv():  # stride (1,8,8) 3x3x3 depthwise
    x = rnd((B, 8, 56, 56, 96))
    w = rnd((3, 3, 3, 1, 96))
    f = jax.jit(lambda x, w: _dw_conv(x, w, (1, 8, 8)))
    return timeit(f, x, w)


def op_relpos_tables():  # the bthwyc,hkc einsums (block 0)
    q = rnd((B, N1, 1, 96))
    rh = rnd((111, 96))
    rw = rnd((111, 96))

    def f(q, rh, rw):
        r_q = q[:, 1:].reshape(B, 8, 56, 56, 1, 96)
        Rh = rh[:56][:, None].repeat(7, 1)  # stand-in gather [56,7,96]
        Rw = rw[:56][:, None].repeat(7, 1)
        a = jnp.einsum("bthwyc,hkc->bthwyk", r_q, Rh)
        b = jnp.einsum("bthwyc,wkc->bthwyk", r_q, Rw)
        return a.reshape(B, -1, 1, 7), b.reshape(B, -1, 1, 7)

    return timeit(jax.jit(f), q, rh, rw)


def op_attn_ext():  # extended-matmul attention, block-0 shapes
    nk = 393
    q = rnd((B, N1, 1, 118))
    k = rnd((B, nk, 1, 118))
    v = rnd((B, nk, 1, 96))

    def f(q, k, v):
        attn = jnp.einsum("bqhc,bkhc->bhqk", q, k)
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bkhc->bqhc", attn, v)

    return timeit(jax.jit(f), q, k, v)


def op_attn_qk_only():
    nk = 393
    q = rnd((B, N1, 1, 118))
    k = rnd((B, nk, 1, 118))
    f = jax.jit(lambda q, k: jnp.einsum("bqhc,bkhc->bhqk", q, k))
    return timeit(f, q, k)


def op_softmax():
    s = rnd((B, 1, N1, 393))
    f = jax.jit(lambda s: jax.nn.softmax(s, axis=-1))
    return timeit(f, s)


def op_attn_b1():  # block-1 attention: q 25089 tokens -> pooled 6273, 2 heads
    nk = 8 * 14 * 14 + 1
    q = rnd((B, N2, 2, 118))
    k = rnd((B, nk, 2, 118))
    v = rnd((B, nk, 2, 96))

    def f(q, k, v):
        attn = jnp.einsum("bqhc,bkhc->bhqk", q, k)
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bkhc->bqhc", attn, v)

    return timeit(jax.jit(f), q, k, v)


def op_concat_qext():  # q_ext concat cost
    q = rnd((B, N1, 1, 96))
    r = rnd((B, N1, 1, 22))
    f = jax.jit(lambda q, r: jnp.concatenate([q, r], axis=-1))
    return timeit(f, q, r)


def op_patch_embed():  # stem conv 3x7x7 s(2,4,4)
    x = rnd((B, 16, 224, 224, 3))
    w = rnd((3, 7, 7, 3, 96))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 4, 4), padding=[(1, 1), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    return timeit(jax.jit(f), x, w)


OPS = {k[3:]: v for k, v in list(globals().items()) if k.startswith("op_")}


def main():
    names = sys.argv[1:] or list(OPS)
    for name in names:
        try:
            ms = OPS[name]()
            print(json.dumps({"op": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"op": name, "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
