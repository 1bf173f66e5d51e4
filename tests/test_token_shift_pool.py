"""token_shift pool (flat-token shifted-MAC depthwise conv) equals the
grid conv path bit-near on shared params.

The impl is an explicit opt-in (measured loss end-to-end on v5e — its
weight gradient lowers to 27 full-tensor multiply-reduces; see ROADMAP),
but the math must stay exact for any backend that does want it.
Reference semantics: `MViT/slowfast/models/attention.py:13-49`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.attention import AttentionPool


@pytest.mark.parametrize(
    "has_cls,thw,heads,ch",
    [(True, (4, 6, 5), 2, 16), (False, (2, 4, 4), 1, 8),
     (True, (3, 7, 7), 4, 12)],
)
def test_token_shift_matches_grid_conv(has_cls, thw, heads, ch):
    n = int(np.prod(thw)) + (1 if has_cls else 0)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, n, heads, ch).astype(np.float32)
    )
    kw = dict(kernel=(3, 3, 3), stride=(1, 1, 1), mode="conv",
              has_cls_embed=has_cls)
    token = AttentionPool(**kw, pool_impl="token_shift")
    grid = AttentionPool(**kw, pool_impl="custom_vjp")  # grid-path impl
    params = token.init(jax.random.PRNGKey(0), x, thw)
    y_token, thw_token = token.apply(params, x, thw)
    y_grid, thw_grid = grid.apply(params, x, thw)
    assert thw_token == thw_grid == tuple(thw)
    np.testing.assert_allclose(
        np.asarray(y_token), np.asarray(y_grid), atol=1e-4, rtol=1e-5
    )


def test_token_shift_gradients_match():
    thw, heads, ch = (2, 4, 4), 2, 8
    n = int(np.prod(thw)) + 1
    x = jnp.asarray(np.random.RandomState(1).randn(1, n, heads, ch)
                    .astype(np.float32))
    kw = dict(kernel=(3, 3, 3), stride=(1, 1, 1), mode="conv",
              has_cls_embed=True)
    token = AttentionPool(**kw, pool_impl="token_shift")
    grid = AttentionPool(**kw, pool_impl="custom_vjp")
    params = token.init(jax.random.PRNGKey(0), x, thw)

    def loss(mod, p, xx):
        y, _ = mod.apply(p, xx, thw)
        return jnp.sum(y ** 2)

    g_token = jax.grad(lambda p: loss(token, p, x))(params)
    g_grid = jax.grad(lambda p: loss(grid, p, x))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4
        ),
        g_token, g_grid,
    )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
