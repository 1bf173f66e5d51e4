"""Micro-bench: Pallas depthwise3x3x3 vs XLA grouped conv, fwd and fwd+bwd.

Axon-tunnel-safe timing: chain K applications inside one jit and sync with
device_get (block_until_ready under-reports over the tunnel; see ROADMAP).

Stage shapes for MViTv2-S 16x4 @ 224 (bs 8, heads folded into channels):
  stage1: [8, 8, 56, 56, 96]; stage2: [8, 8, 28, 28, 192]; stage3: 14x14x384.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.ops.depthwise_pallas import depthwise3x3x3

K = 16


def xla_dw(x, w):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 3, 1, c), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
    )


def chain_fwd(f, x, w):
    def body(i, y):
        return f(y, w).astype(y.dtype)
    return jnp.sum(jax.lax.fori_loop(0, K, body, x).astype(jnp.float32))


def chain_loss(f, x, w):
    def body(i, y):
        return f(y, w).astype(y.dtype)
    y = jax.lax.fori_loop(0, K, body, x)
    return jnp.sum(y.astype(jnp.float32) ** 2)


def timed(fn, *args, n=5):
    jax.device_get(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.device_get(fn(*args))
    dt = (time.perf_counter() - t0) / n
    return dt * 1e3 / K  # ms per single application


def timed_single(fn, *args, n=20):
    """ms per call, device_get-synced, dispatch overhead NOT subtracted."""
    jax.device_get(jax.tree.map(jnp.sum, fn(*args)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.device_get(jax.tree.map(jnp.sum, fn(*args)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dt = jnp.bfloat16
    trivial = jax.jit(lambda x: x[0, 0, 0, 0, 0] * 2)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(8, 8, 56, 56, 96)), dt)
    overhead = timed_single(trivial, x0)
    print(f"dispatch overhead ~{overhead:.3f} ms", flush=True)

    for shape in [(8, 8, 56, 56, 96), (8, 8, 28, 28, 192), (8, 8, 14, 14, 384)]:
        b, t, h, wd, c = shape
        x = jnp.asarray(rng.normal(size=shape), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, c)) * 0.1, dt)

        def loss_of(f):
            return lambda x, w: jnp.sum(f(x, w).astype(jnp.float32) ** 2)

        def xla_dw_pad(x, w):
            cc = x.shape[-1]
            cp = -(-cc // 128) * 128
            xpad = jnp.pad(x, ((0, 0),) * 4 + ((0, cp - cc),))
            wpad = jnp.pad(w, ((0, 0),) * 3 + ((0, cp - cc),))
            return xla_dw(xpad, wpad)[..., :cc]

        def dw_reduce(x, g):
            # dw via 27 shifted reduces (current custom-vjp backward).
            bt, tt, hh, ww, cc = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
            g32 = g.astype(jnp.float32)
            taps = []
            for dti in range(3):
                for dhi in range(3):
                    for dwi in range(3):
                        patch = xp[:, dti : dti + tt, dhi : dhi + hh, dwi : dwi + ww, :]
                        taps.append(jnp.sum(patch * g32, axis=(0, 1, 2, 3)))
            return jnp.stack(taps)

        r = {}
        r["pl_fwd"] = timed(jax.jit(functools.partial(chain_fwd, depthwise3x3x3)), x, w)
        r["xla_fwd"] = timed(jax.jit(functools.partial(chain_fwd, xla_dw)), x, w)
        r["xla_pad_fwd"] = timed(jax.jit(functools.partial(chain_fwd, xla_dw_pad)), x, w)
        g = jnp.asarray(rng.normal(size=shape), dt)

        def chain_dw(x, g):
            def body(i, acc):
                # vary g per iteration to defeat loop-invariant hoisting
                return acc + dw_reduce(x, g * (1.0 + 0.001 * i))
            return jnp.sum(jax.lax.fori_loop(0, K, body, jnp.zeros((27, c), jnp.float32)))

        r["dw_reduce"] = timed(jax.jit(chain_dw), x, g)
        print(shape, {k: round(v, 3) for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
