"""Int8 forward-dense quantization (ops/quant.py, TPU.INT8_DENSE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.ops.quant import int8_dot, int8_dot_fwd_only, QuantDense


def test_int8_dot_forward_close():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 192)) * 0.05, jnp.float32)
    y = int8_dot(x, w)
    ref = x @ w
    # Per-operand int8 relative error ~0.4%; output error bounded by the
    # row/col scales. Check relative Frobenius error.
    err = jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref)
    assert err < 0.015, float(err)


def test_int8_dot_zero_rows_exact():
    x = jnp.zeros((2, 8, 16), jnp.float32)
    w = jnp.ones((16, 4), jnp.float32)
    y = int8_dot(x, w)
    assert jnp.all(y == 0)
    assert jnp.all(jnp.isfinite(y))


def test_int8_dot_gradients_are_full_precision():
    """The STE backward must be bit-identical to autodiff of the plain dot."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 48)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(48, 24)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 32, 24)), jnp.float32)

    def loss_q(x, w):
        return jnp.vdot(int8_dot(x, w), g)

    def loss_f(x, w):
        return jnp.vdot(x @ w, g)

    dxq, dwq = jax.grad(loss_q, argnums=(0, 1))(x, w)
    dxf, dwf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    np.testing.assert_array_equal(np.asarray(dxq), np.asarray(dxf))
    np.testing.assert_allclose(np.asarray(dwq), np.asarray(dwf), rtol=1e-6)


def test_int8_dot_bf16_operands():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(16, 32)) * 0.1, jnp.bfloat16)
    y = int8_dot(x, w)
    assert y.dtype == jnp.bfloat16
    ref = (x.astype(jnp.float32) @ w.astype(jnp.float32))
    err = np.linalg.norm(np.asarray(y, np.float32) - np.asarray(ref))
    err /= np.linalg.norm(np.asarray(ref))
    assert err < 0.03, float(err)


def test_quant_dense_param_tree_matches_nn_dense():
    import flax.linen as nn

    x = jnp.ones((2, 5, 16))
    qd = QuantDense(features=8)
    d = nn.Dense(features=8)
    pq = qd.init(jax.random.PRNGKey(0), x)["params"]
    pd = d.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pd)
    for a, b in zip(jax.tree_util.tree_leaves(pq), jax.tree_util.tree_leaves(pd)):
        assert a.shape == b.shape


@pytest.mark.slow
def test_mvit_int8_dense_end_to_end():
    """Tiny MViT with INT8_DENSE on: same param tree, close logits,
    finite gradients."""
    from pmv_tpu.config.defaults import get_cfg
    from pmv_tpu.models.build import build_model
    from tests.helpers import tiny_mvit_cfg

    cfg = tiny_mvit_cfg()
    cfg.TPU.INT8_DENSE = False
    model0, params0 = build_model(cfg, jax.random.PRNGKey(0))
    cfg.TPU.INT8_DENSE = True
    model1, params1 = build_model(cfg, jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(params0) == jax.tree_util.tree_structure(params1)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 56, 56, 3)), jnp.float32
    )
    y0 = model0.apply(params0, x, train=False)
    y1 = model1.apply(params1, x, train=False)
    # Logits drift under quantization but stay in the same regime.
    assert np.all(np.isfinite(np.asarray(y1)))
    rel = np.linalg.norm(np.asarray(y1 - y0)) / max(
        np.linalg.norm(np.asarray(y0)), 1e-6
    )
    assert rel < 0.5, rel

    def loss(p):
        return jnp.sum(model1.apply(p, x, train=False) ** 2)

    grads = jax.grad(loss)(params1)
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )
