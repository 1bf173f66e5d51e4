"""Equality-mask max-pool backward vs XLA's select_and_scatter.

Forward must be bit-identical; gradients must match exactly on tie-free
(continuous random) input. Reference semantics: the skip-path max pool in
`MViT/slowfast/models/attention.py` MultiScaleBlock (pool_skip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.ops.maxpool_eqgrad import _eligible, max_pool_3d_eqgrad


def _ref_pool(x, kernel, stride, padding):
    dims = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple(padding) + ((0, 0),)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, pads
    )


GEOMETRIES = [
    # (shape BTHWC, kernel, stride, padding) — block-1 skip pool geometry
    # (q-stride (1,2,2), kernel 1+2*pad) and stage-transition variants.
    ((2, 8, 16, 12, 8), (1, 3, 3), (1, 2, 2), ((0, 0), (1, 1), (1, 1))),
    ((2, 8, 8, 8, 8), (3, 3, 3), (2, 2, 2), ((1, 1), (1, 1), (1, 1))),
    ((1, 4, 8, 8, 4), (1, 1, 1), (1, 1, 1), ((0, 0), (0, 0), (0, 0))),
    ((2, 4, 12, 8, 4), (1, 3, 3), (1, 4, 4), ((0, 0), (1, 1), (1, 1))),
]


@pytest.mark.parametrize("shape,kernel,stride,padding", GEOMETRIES)
def test_eqgrad_matches_select_and_scatter(shape, kernel, stride, padding):
    x = jnp.asarray(
        np.random.RandomState(0).randn(*shape).astype(np.float32)
    )
    assert _eligible(x.shape, kernel, stride, padding)

    y0 = _ref_pool(x, kernel, stride, padding)
    y1 = max_pool_3d_eqgrad(x, kernel, stride, padding)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    dy = jnp.asarray(
        np.random.RandomState(1).randn(*y0.shape).astype(np.float32)
    )
    g0 = jax.grad(lambda v: jnp.sum(_ref_pool(v, kernel, stride, padding) * dy))(x)
    g1 = jax.grad(
        lambda v: jnp.sum(max_pool_3d_eqgrad(v, kernel, stride, padding) * dy)
    )(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)


def test_eligibility_gate():
    # out*stride != in on the H axis -> ineligible.
    assert not _eligible((1, 8, 9, 8, 4), (1, 3, 3), (1, 2, 2),
                         ((0, 0), (1, 1), (1, 1)))
