"""Round-3 parity-gap fixes: activation counting, chunk-loader epoch math."""

import math

import jax.numpy as jnp
import numpy as np

from pmv_tpu.utils.misc import activations_count


def test_activations_count_dot():
    # fvcore activation semantics: output numel of gemm/conv ops only.
    w = jnp.ones((8, 16))

    def fn(x):
        h = x @ w          # [2, 16] -> 32
        return jnp.tanh(h)  # elementwise: not counted

    assert activations_count(fn, jnp.ones((2, 8))) == 32


def test_activations_count_conv():
    import jax

    w = jnp.ones((3, 3, 3, 4))  # HWIO

    def fn(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [1, 5, 5, 4] -> 100

    assert activations_count(fn, jnp.ones((1, 5, 5, 3))) == 100


def test_activations_count_recurses_remat():
    import jax

    w = jnp.ones((8, 8))

    @jax.checkpoint
    def body(x):
        return x @ w  # [2, 8] -> 16

    assert activations_count(body, jnp.ones((2, 8))) == 16


def test_chunk_epoch_skip_rows_cycle():
    # The engine's per-epoch skip_rows advance (`train_net.py:675-686`).
    chunk, overall = 2, 5
    num_chunks = math.ceil(overall / chunk)
    skips = [(e % num_chunks) * chunk for e in range(1, 7)]
    assert skips == [2, 4, 0, 2, 4, 0]
