"""Numerical parity against torch ops and the checkpoint importer.

These tests pin the layout conventions that checkpoint parity depends on:
conv3d kernel transposition, linear transposition, BN stats mapping, and
2D->3D inflation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402

from pmv_tpu.utils import torch_import  # noqa: E402


def test_conv3d_layout_parity():
    """flax NDHWC conv with transposed torch weights == torch Conv3d."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 8, 8, 3)).astype(np.float32)
    w = rng.normal(size=(16, 3, 3, 3, 3)).astype(np.float32) * 0.1
    b = rng.normal(size=(16,)).astype(np.float32)

    tout = torch.nn.functional.conv3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        torch.from_numpy(w), torch.from_numpy(b), stride=1, padding=1,
    ).permute(0, 2, 3, 4, 1).numpy()

    conv = nn.Conv(16, (3, 3, 3), padding=[(1, 1)] * 3)
    variables = {
        "params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": jnp.asarray(b),
        }
    }
    jout = conv.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-4)


def test_depthwise_conv3d_parity():
    rng = np.random.default_rng(1)
    C = 8
    x = rng.normal(size=(1, 4, 6, 6, C)).astype(np.float32)
    w = rng.normal(size=(C, 1, 3, 3, 3)).astype(np.float32) * 0.1
    tout = torch.nn.functional.conv3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        torch.from_numpy(w), None, stride=(1, 2, 2), padding=1, groups=C,
    ).permute(0, 2, 3, 4, 1).numpy()
    conv = nn.Conv(
        C, (3, 3, 3), strides=(1, 2, 2), padding=[(1, 1)] * 3,
        feature_group_count=C, use_bias=False,
    )
    variables = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}}
    jout = conv.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-4)


def test_linear_and_layernorm_parity():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 7, 16)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32) * 0.1
    b = rng.normal(size=(32,)).astype(np.float32)
    ln_w = rng.normal(size=(16,)).astype(np.float32)
    ln_b = rng.normal(size=(16,)).astype(np.float32)

    tx = torch.from_numpy(x)
    t_ln = torch.nn.functional.layer_norm(
        tx, (16,), torch.from_numpy(ln_w), torch.from_numpy(ln_b), eps=1e-6
    )
    tout = torch.nn.functional.linear(
        t_ln, torch.from_numpy(w), torch.from_numpy(b)
    ).numpy()

    ln = nn.LayerNorm(epsilon=1e-6)
    jx = ln.apply(
        {"params": {"scale": jnp.asarray(ln_w), "bias": jnp.asarray(ln_b)}},
        jnp.asarray(x),
    )
    dense = nn.Dense(32)
    jout = dense.apply(
        {"params": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}}, jx
    )
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-4)


def test_interpolate_linear_parity():
    """rel-pos table interpolation matches torch F.interpolate(linear)."""
    from pmv_tpu.models.attention import interpolate_rel_pos

    rng = np.random.default_rng(3)
    table = rng.normal(size=(15, 8)).astype(np.float32)
    out = interpolate_rel_pos(jnp.asarray(table), 27)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(table).reshape(1, 15, 8).permute(0, 2, 1),
            size=27, mode="linear",
        )
        .reshape(8, 27).permute(1, 0).numpy()
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_importer_roundtrip_mvit_tiny(tmp_path):
    """Export a tiny MViT param tree to torch layout, reimport, compare."""
    from pmv_tpu.config import get_cfg
    from pmv_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2]]
    cfg.MVIT.DIM_MUL_IN_ATT = True
    cfg.MVIT.RESIDUAL_POOLING = True
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]

    # Build the torch-layout state dict via the inverse transforms.
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [str(k.key) for k in path]
        tname = torch_import._flax_path_to_torch(names)
        arr = np.asarray(leaf)
        if names[-1] in ("kernel", "pool_kernel") and arr.ndim == 5:
            arr = arr.transpose(4, 3, 0, 1, 2)
        elif names[-1] == "kernel" and arr.ndim == 2:
            arr = arr.T
        sd[tname] = torch.from_numpy(np.ascontiguousarray(arr))

    ckpt_path = tmp_path / "model.pyth"
    torch.save({"model_state": sd}, ckpt_path)

    imported = torch_import.load_torch_checkpoint_params(
        str(ckpt_path), cfg, params
    )
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(imported)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=str([str(k.key) for k in p1]),
        )


def test_inflation_2d_to_3d():
    w2d = np.ones((4, 3, 7, 7), np.float32)
    out = torch_import._convert_tensor(w2d, (5, 7, 7, 3, 4), "x")
    assert out.shape == (5, 7, 7, 3, 4)
    # Average inflation: sum over T reproduces the 2D response.
    np.testing.assert_allclose(out.sum(axis=0), np.ones((7, 7, 3, 4)))


def test_dilated_conv3d_parity():
    """Dilated res5 (AVA detection: SPATIAL_DILATIONS [[1],[1],[1],[2]]):
    padding == dilation must preserve HW AND dilate the taps (regression:
    _conv dropped kernel_dilation, producing 16x16 from 14x14)."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 2, 14, 14, 8)).astype(np.float32)
    w = rng.normal(size=(16, 8, 1, 3, 3)).astype(np.float32) * 0.1
    tout = torch.nn.functional.conv3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        torch.from_numpy(w), None, stride=1,
        padding=(0, 2, 2), dilation=(1, 2, 2),
    ).permute(0, 2, 3, 4, 1).numpy()
    assert tout.shape[2:4] == (14, 14)

    from pmv_tpu.models.resnet_helper import _conv

    conv = _conv(16, (1, 3, 3), (1, 1, 1), (0, 2, 2), dilation=2)
    variables = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}}
    jout = conv.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-4)
