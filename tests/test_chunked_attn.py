"""Q-tiled (chunked) attention: exactness vs the single extended matmul.

The chunked path (TPU.ATTN_Q_CHUNK, chunked_attention in
models/attention.py) computes scores/softmax/@V per q-chunk; softmax rows
are independent, so outputs and gradients must match the unchunked einsum
path bit-for-bit in f32 (reference math: `MViT/slowfast/models/attention.py:
405-448`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.attention import MultiScaleAttention, chunked_attention


def test_chunked_attention_helper_exact():
    rng = np.random.default_rng(0)
    B, Nq, Nk, H, C, D = 2, 13, 7, 3, 10, 8
    q = jnp.asarray(rng.standard_normal((B, Nq, H, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, H, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, H, D)), jnp.float32)

    def ref(q, k, v):
        s = jnp.einsum("bqhc,bkhc->bhqk", q, k)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhc->bqhc", p, v)

    want = ref(q, k, v)
    for chunk in (4, 5, 13, 64):
        for remat in (True, False):
            got = chunked_attention(q, k, v, chunk, remat=remat)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # gradients (remat path exercises jax.checkpoint)
    def loss(fn):
        return lambda q: jnp.sum(jnp.sin(fn(q, k, v)))

    g_ref = jax.grad(loss(ref))(q)
    g_chunk = jax.grad(
        loss(lambda q, k, v: chunked_attention(q, k, v, 4, remat=True))
    )(q)
    np.testing.assert_allclose(g_chunk, g_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("has_cls", [True, False])
@pytest.mark.parametrize("rel_temporal", [True, False])
def test_chunked_module_matches_unchunked(has_cls, rel_temporal):
    """Full MultiScaleAttention with rel-pos bias: chunked == unchunked."""
    thw = (2, 4, 6)
    n = int(np.prod(thw)) + (1 if has_cls else 0)
    B, dim = 2, 16

    def build(chunk):
        return MultiScaleAttention(
            dim_out=dim,
            num_heads=2,
            input_size=thw,
            qkv_bias=True,
            kernel_q=(),
            kernel_kv=(3, 3, 3),
            stride_kv=(1, 2, 2),
            stride_q=(),
            has_cls_embed=has_cls,
            mode="conv",
            rel_pos_spatial=True,
            rel_pos_temporal=rel_temporal,
            residual_pooling=True,
            sparse_kv=False,
            attn_q_chunk=chunk,
        )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, n, dim)), jnp.float32)
    base = build(0)
    params = base.init(jax.random.PRNGKey(0), x, thw)
    want, thw_w = base.apply(params, x, thw)
    for chunk in (5, 7, 48):
        got, thw_g = build(chunk).apply(params, x, thw)
        assert thw_g == thw_w
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # gradient parity through the module
    def loss_fn(mod):
        def f(p):
            out, _ = mod.apply(p, x, thw)
            return jnp.sum(out * out)

        return f

    g_ref = jax.grad(loss_fn(base))(params)
    g_chk = jax.grad(loss_fn(build(5)))(params)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_c, _ = jax.tree_util.tree_flatten(g_chk)
    for a, b in zip(flat_r, flat_c):
        np.testing.assert_allclose(b, a, rtol=5e-5, atol=5e-5)


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
