"""TPU.LANE_PAD: 128-lane zero-tail-padded activations must be exact.

The padded model keeps every PARAMETER at its reference shape (the param
tree is byte-identical to the unpadded model — same checkpoints, same
init RNG draws) and widens only the activations with zero lane tails.
It must therefore compute the SAME function: identical logits from the
same params, identical gradients (so training trajectories coincide),
and zero-tail invariants on the padded features. This backs the
production recipe's lane-aligned layouts (avoiding XLA's N-minor
relayout copies, round-5 HLO ledger) without any checkpoint transform
(`MViT/slowfast/models/attention.py`, `video_model_builder.py:1726-2171`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.models import build_model

jax.config.update("jax_enable_x64", False)


def _tiny_cfg(lane_pad, heads=1):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 11
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MVIT.DEPTH = 3
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.NUM_HEADS = heads
    cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.QKV_BIAS = True
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2], [2, 1, 1, 1]]
    cfg.MVIT.DIM_MUL_IN_ATT = True
    cfg.MVIT.RESIDUAL_POOLING = True
    cfg.MVIT.CLS_EMBED_ON = True
    cfg.MVIT.FLAT_POOLS = True
    cfg.TPU.LANE_PAD = lane_pad
    return cfg


def _setup(heads=1, abs_pos=False):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    c0, c1 = _tiny_cfg(False, heads), _tiny_cfg(True, heads)
    if abs_pos:
        for c in (c0, c1):
            c.MVIT.USE_ABS_POS = True
            c.MVIT.SEP_POS_EMBED = True
    base = build_model(c0, dtype=jnp.float32)
    padded = build_model(c1, dtype=jnp.float32)
    v = base.init(rng, x, train=False)
    return base, padded, v, x


def test_lane_pad_identical_param_tree():
    base, padded, v, x = _setup()
    v2 = padded.init(jax.random.PRNGKey(0), x, train=False)
    flat1 = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    flat2 = {tuple(str(k.key) for k in p): l
             for p, l in jax.tree_util.tree_flatten_with_path(
                 v2["params"])[0]}
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        names = tuple(str(k.key) for k in path)
        assert flat2[names].shape == leaf.shape, names
        # Same init draws: parameters are numerically identical too.
        np.testing.assert_array_equal(
            np.asarray(flat2[names]), np.asarray(leaf), err_msg=str(names)
        )


@pytest.mark.parametrize("heads", [1, 2])
def test_lane_pad_logit_parity(heads):
    base, padded, v, x = _setup(heads)
    out_b = np.asarray(base.apply(v, x, train=False))
    out_p = np.asarray(padded.apply(v, x, train=False))
    np.testing.assert_allclose(out_p, out_b, rtol=1e-5, atol=1e-6)


def test_lane_pad_logit_parity_abs_pos():
    base, padded, v, x = _setup(abs_pos=True)
    out_b = np.asarray(base.apply(v, x, train=False))
    out_p = np.asarray(padded.apply(v, x, train=False))
    np.testing.assert_allclose(out_p, out_b, rtol=1e-5, atol=1e-6)


def test_lane_pad_grad_equivalence():
    base, padded, v, x = _setup(heads=2)
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 11))

    def loss(model):
        def f(p):
            out = model.apply({"params": p}, x, train=False)
            return jnp.sum((out - jax.nn.softmax(y)) ** 2)
        return f

    g_b = jax.grad(loss(base))(v["params"])
    g_p = jax.grad(loss(padded))(v["params"])
    flat_b = jax.tree_util.tree_flatten_with_path(g_b)[0]
    flat_p = {tuple(str(k.key) for k in p): l
              for p, l in jax.tree_util.tree_flatten_with_path(g_p)[0]}
    for path, gb in flat_b:
        names = tuple(str(k.key) for k in path)
        np.testing.assert_allclose(
            np.asarray(flat_p[names]), np.asarray(gb),
            rtol=1e-4, atol=1e-5, err_msg=".".join(names),
        )


def test_lane_pad_training_trajectory_matches():
    """Same params + same grads => same adamw trajectory; check 3 steps."""
    base, padded, v, x = _setup(heads=2)
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 11))
    tx = optax.adamw(1e-3, weight_decay=0.05)

    def run(model):
        params = v["params"]
        opt_state = tx.init(params)

        def loss(p):
            out = model.apply({"params": p}, x, train=False)
            return jnp.sum((out - jax.nn.softmax(y)) ** 2)

        for _ in range(3):
            g = jax.grad(loss)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
        return loss(params), params

    lb, pb = run(base)
    lp, pp = run(padded)
    np.testing.assert_allclose(float(lp), float(lb), rtol=1e-4)
    # adamw divides by sqrt(v)+eps, so float-tolerance-level gradient
    # differences (reduce orders differ between the padded and unpadded
    # lowerings) become O(1) RELATIVE update differences wherever the
    # gradient is ~0; absolute agreement is the meaningful bound here
    # (a structural bug shows up as O(1) absolute drift).
    for a, b in zip(jax.tree_util.tree_leaves(pb),
                    jax.tree_util.tree_leaves(pp)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-2, atol=5e-4
        )


def test_lane_pad_features_tail_is_zero():
    """The padded residual stream really carries zero lane tails (the
    invariant every PaddedDense/MaskedLayerNorm relies on)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    model = build_model(_tiny_cfg(True, heads=2), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)

    # The features tap returns the REAL (sliced) width so downstream
    # consumers (masked/contrastive heads) see reference shapes; values
    # must equal the unpadded model's features.
    feats, thw = model.apply(v, x, train=False, return_features=True)
    model0 = build_model(_tiny_cfg(False, heads=2), dtype=jnp.float32)
    feats0, _ = model0.apply(v, x, train=False, return_features=True)
    assert feats.shape == feats0.shape  # pads sliced off for consumers
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(feats0), rtol=1e-5, atol=1e-6
    )
