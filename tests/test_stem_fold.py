"""Folded stem convolutions must equal the direct lowering exactly.

Covers the round-5 generalization of the TPU.FOLD_STEM input fold to
arbitrary window/cell extents plus the output-position fold that fixes
the SlowFast fast-pathway stem (8 output channels ran at ~0.1 TF/s on
v5e: 43.4 ms fwd + 13.5 ms bwd of a 152 ms step). Reference semantics:
`MViT/slowfast/models/stem_helper.py` ResNetBasicStem / PatchEmbed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.models.stem import (
    ResNetBasicStem,
    _fold_out_conv,
    _fold_out_factor,
    _fold_patch_conv,
)

jax.config.update("jax_enable_x64", False)

GEOMS = [
    # (name, x shape, kernel shape, stride, padding, out_fold)
    ("fast_stem_in", (2, 6, 32, 32, 3), (5, 7, 7, 3, 8), (1, 2, 2), (2, 3, 3), None),
    ("fast_stem_out4", (2, 6, 32, 32, 3), (5, 7, 7, 3, 8), (1, 2, 2), (2, 3, 3), 4),
    ("slow_stem", (2, 4, 32, 32, 3), (1, 7, 7, 3, 64), (1, 2, 2), (0, 3, 3), None),
    ("out_fold2", (2, 4, 32, 32, 3), (1, 7, 7, 3, 16), (1, 2, 2), (0, 3, 3), 2),
    ("mvit_patch", (2, 8, 32, 32, 3), (3, 7, 7, 3, 96), (2, 4, 4), (1, 3, 3), None),
]


@pytest.mark.parametrize("name,xs,ks,stride,pad,f", GEOMS)
def test_fold_conv_matches_direct(name, xs, ks, stride, pad, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
    w = jnp.asarray(rng.standard_normal(ks) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, stride, [(p, p) for p in pad],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if f is None:
        got = _fold_patch_conv(
            x, w, jnp.zeros((ks[-1],)), ks[:3], stride, pad, jnp.float32
        )
    else:
        got = _fold_out_conv(x, w, ks[:3], stride, pad, f, jnp.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fold_conv_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 7, 7, 3, 8)) * 0.05, jnp.float32)

    def loss_ref(ww):
        y = jax.lax.conv_general_dilated(
            x, ww, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.sum(y ** 2)

    def loss_fold(ww):
        y = _fold_out_conv(
            x, ww, (5, 7, 7), (1, 2, 2), (2, 3, 3), 4, jnp.float32
        )
        return jnp.sum(y ** 2)

    g_ref = jax.grad(loss_ref)(w)
    g_fold = jax.grad(loss_fold)(w)
    np.testing.assert_allclose(
        np.asarray(g_fold), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_resnet_stem_fold_matches_plain():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 32, 32, 3)), jnp.float32)
    plain = ResNetBasicStem(
        dim_out=8, kernel=(5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3),
        use_fold=False,
    )
    folded = ResNetBasicStem(
        dim_out=8, kernel=(5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3),
        use_fold=True,
    )
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    # Identical param trees (same conv/kernel path and shape).
    v2 = folded.init(jax.random.PRNGKey(0), x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape
    y0 = plain.apply(v, x, train=False)
    y1 = folded.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4
    )


def test_x3d_stem_fold_matches_plain():
    from pmv_tpu.models.stem import X3DStem

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    plain = X3DStem(
        dim_out=24, kernel=(5, 3, 3), stride=(1, 2, 2), padding=(2, 1, 1),
        use_fold=False,
    )
    folded = X3DStem(
        dim_out=24, kernel=(5, 3, 3), stride=(1, 2, 2), padding=(2, 1, 1),
        use_fold=True,
    )
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    v2 = folded.init(jax.random.PRNGKey(0), x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape
    y0 = plain.apply(v, x, train=False)
    y1 = folded.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4
    )


def test_resnet_stem_folded_bn_train_mode_matches():
    """Folded-layout BN statistics must equal nn.BatchNorm's exactly
    (equal-weight combination across position groups), including the
    running-stats update."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 6, 32, 32, 3)), jnp.float32)
    plain = ResNetBasicStem(
        dim_out=8, kernel=(5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3),
        use_fold=False,
    )
    folded = ResNetBasicStem(
        dim_out=8, kernel=(5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3),
        use_fold=True,
    )
    v = plain.init(jax.random.PRNGKey(0), x, train=True)
    v2 = folded.init(jax.random.PRNGKey(0), x, train=True)
    for (p1, a), (p2, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(v)[0],
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(v2)[0],
               key=lambda t: str(t[0])),
    ):
        assert str(p1) == str(p2) and a.shape == b.shape, (p1, p2)
    y0, m0 = plain.apply(v, x, train=True, mutable=["batch_stats"])
    y1, m1 = folded.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(jax.tree_util.tree_leaves(m0),
                    jax.tree_util.tree_leaves(m1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )
