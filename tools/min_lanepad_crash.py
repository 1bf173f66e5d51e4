"""Minimize the lane_pad train-compile HTTP-500 (round 5).

Each candidate padded construct from the TPU.LANE_PAD path is compiled
as a tiny standalone train-like grad jit against the remote compile
helper; whichever reproduces the crash is the culprit. Run on the TPU.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pmv_tpu  # noqa: F401  (persistent compile cache)
import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK")
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"{name}: FAIL {msg}")


def main():
    rng = np.random.default_rng(0)
    B, T, H, W = 2, 4, 16, 16
    real_c, pad_c = 96, 128
    x = jnp.asarray(rng.standard_normal((B, T, H, W, pad_c)), jnp.bfloat16)
    x = x.at[..., real_c:].set(0)
    k_real = jnp.asarray(
        rng.standard_normal((3, 3, 3, 1, real_c)), jnp.float32
    )

    # 1. depthwise conv, kernel padded via concatenate (current code)
    def conv_concat(k):
        kc = jnp.concatenate(
            [k, jnp.zeros(k.shape[:4] + (pad_c - real_c,), k.dtype)], -1
        ).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, kc, (1, 2, 2), [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=pad_c,
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    probe("dw_conv_kernel_concat_grad", jax.grad(conv_concat), k_real)

    # 2. same but jnp.pad
    def conv_pad(k):
        kc = jnp.pad(k, ((0, 0),) * 4 + ((0, pad_c - real_c),)).astype(
            jnp.bfloat16
        )
        y = jax.lax.conv_general_dilated(
            x, kc, (1, 2, 2), [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=pad_c,
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    probe("dw_conv_kernel_pad_grad", jax.grad(conv_pad), k_real)

    # 3. depthwise conv at padded width, kernel born padded (no pad op)
    k_full = jnp.asarray(
        rng.standard_normal((3, 3, 3, 1, pad_c)), jnp.float32
    )

    def conv_full(k):
        y = jax.lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 2, 2),
            [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=pad_c,
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    probe("dw_conv_full128_grad", jax.grad(conv_full), k_full)

    # 4. MaskedLayerNorm-style sliced stats
    tok = jnp.asarray(rng.standard_normal((B, 37, pad_c)), jnp.bfloat16)
    sc = jnp.ones((real_c,), jnp.float32)

    def mln(s):
        xr = jax.lax.slice_in_dim(tok, 0, real_c, axis=-1).astype(
            jnp.float32
        )
        mean = jnp.mean(xr, -1, keepdims=True)
        var = jnp.mean(xr * xr, -1, keepdims=True) - mean * mean
        sp = jnp.pad(s, (0, pad_c - real_c))
        y = (tok.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-6) * sp
        return jnp.sum(y ** 2)

    probe("masked_ln_grad", jax.grad(mln), sc)

    # 5. PaddedDense-style dot (kernel sliced from fused param + padded)
    kern = jnp.asarray(
        rng.standard_normal((real_c, 3 * real_c)), jnp.float32
    )

    def pdot(kk):
        w = jax.lax.slice_in_dim(kk, 0, real_c, axis=1)
        w = jnp.pad(w, ((0, pad_c - real_c), (0, pad_c - real_c)))
        y = jnp.dot(tok, w.astype(jnp.bfloat16))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    probe("padded_qkv_dot_grad", jax.grad(pdot), kern)

    # 6. select-and-scatter (skip max-pool bwd) at padded channels
    def maxp(z):
        y = jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    probe("skip_maxpool_grad", jax.grad(maxp), x)


if __name__ == "__main__":
    main()
