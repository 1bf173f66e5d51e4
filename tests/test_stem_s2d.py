"""Space-to-depth patch-embed lowering equals the conv stem bit-near.

The S2D path (`pmv_tpu/models/stem.py` `_s2d_patch_conv`) reuses the exact
conv param tree, so it must produce the same tokens for any geometry it
claims to cover. Reference semantics: `MViT/slowfast/models/stem_helper.py`
PatchEmbed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.stem import PatchEmbed, _s2d_conv_applies


GEOMETRIES = [
    # (kernel, stride, padding, input shape) — MViT stem, MAE-style, 1x8x8.
    ((3, 7, 7), (2, 4, 4), (1, 3, 3), (2, 8, 32, 36, 3)),
    ((2, 4, 4), (2, 4, 4), (0, 0, 0), (2, 8, 16, 16, 3)),
    ((1, 8, 8), (1, 8, 8), (0, 0, 0), (1, 4, 24, 24, 3)),
]


@pytest.mark.parametrize("kernel,stride,pad,shape", GEOMETRIES)
def test_s2d_matches_conv(kernel, stride, pad, shape):
    assert _s2d_conv_applies(kernel, stride, pad)
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    conv = PatchEmbed(dim_out=96, kernel=kernel, stride=stride, padding=pad,
                      use_s2d=False)
    s2d = PatchEmbed(dim_out=96, kernel=kernel, stride=stride, padding=pad,
                     use_s2d=True)
    params = conv.init(jax.random.PRNGKey(0), x)
    y0, thw0 = conv.apply(params, x)
    y1, thw1 = s2d.apply(params, x)  # same param tree by construction
    assert thw0 == thw1
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=1e-5)


def test_s2d_gate_rejects_wide_kernels():
    # Kernel spanning >2 stride blocks per axis is out of scope.
    assert not _s2d_conv_applies((5, 7, 7), (1, 4, 4), (0, 3, 3))


FOLD_GEOMETRIES = [
    ((3, 7, 7), (2, 4, 4), (1, 3, 3), (2, 8, 32, 36, 3)),  # MViT stem
    ((2, 4, 4), (2, 4, 4), (0, 0, 0), (2, 8, 16, 16, 3)),  # 1-cell fold
]


@pytest.mark.parametrize("kernel,stride,pad,shape", FOLD_GEOMETRIES)
def test_fold_matches_conv(kernel, stride, pad, shape):
    """Channel-folded stem (TPU.FOLD_STEM) equals the conv bit-near, for
    values and parameter gradients, on the shared param tree."""
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    conv = PatchEmbed(dim_out=96, kernel=kernel, stride=stride, padding=pad,
                      use_s2d=False)
    fold = PatchEmbed(dim_out=96, kernel=kernel, stride=stride, padding=pad,
                      use_s2d=False, use_fold=True)
    params = conv.init(jax.random.PRNGKey(0), x)
    y0, thw0 = conv.apply(params, x)
    y1, thw1 = fold.apply(params, x)
    assert thw0 == thw1
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=1e-5)

    def loss(m, p):
        return jnp.sum(m.apply(p, x)[0] ** 2)

    g0 = jax.grad(lambda p: loss(conv, p))(params)
    g1 = jax.grad(lambda p: loss(fold, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-5
        ),
        g0, g1,
    )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
