"""Token-chunked MLP (TPU.MLP_CHUNK) exactness vs the plain lowering."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.models.common import Mlp


def test_mlp_chunk_exact_and_same_params():
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 300, 16)).astype(np.float32)
    )
    base = Mlp(hidden_features=64, out_features=16, dtype=jnp.float32)
    chunked = Mlp(
        hidden_features=64, out_features=16, dtype=jnp.float32, chunk=128
    )
    v = base.init(jax.random.PRNGKey(0), x)
    # Same param tree (checkpoint compatibility).
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        chunked.init(jax.random.PRNGKey(0), x)
    )
    np.testing.assert_array_equal(
        np.asarray(base.apply(v, x)), np.asarray(chunked.apply(v, x))
    )

    def loss(variables, m):
        return jnp.sum(m.apply(variables, x) ** 2)

    g0 = jax.grad(loss)(v, base)
    g1 = jax.grad(loss)(v, chunked)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_mlp_chunk_bf16_exact():
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 200, 8)).astype(np.float32)
    )
    base = Mlp(hidden_features=32, out_features=8, dtype=jnp.bfloat16)
    chunked = Mlp(
        hidden_features=32, out_features=8, dtype=jnp.bfloat16, chunk=64
    )
    v = base.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(base.apply(v, x).astype(jnp.float32)),
        np.asarray(chunked.apply(v, x).astype(jnp.float32)),
    )


def test_mlp_chunk_ignored_with_dropout():
    """drop_rate > 0 keeps the unchunked lowering (rng semantics)."""
    x = jnp.ones((1, 100, 8))
    m = Mlp(
        hidden_features=16, out_features=8, drop_rate=0.1, chunk=32,
        dtype=jnp.float32,
    )
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(
        v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out.shape == (1, 100, 8)
