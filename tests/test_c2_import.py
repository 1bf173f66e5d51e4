"""Caffe2-legacy checkpoint import (name conversion + end-to-end load)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.config import get_cfg
from pmv_tpu.models import build_model
from pmv_tpu.utils import c2_import, torch_import


def test_convert_c2_name_table():
    # Known pairs from the reference conversion semantics
    # (`MViT/slowfast/utils/c2_model_loading.py`).
    pairs = {
        "conv1_w": "s1.pathway0_stem.conv.weight",
        "res_conv1_bn_s": "s1.pathway0_stem.bn.weight",
        "res_conv1_bn_riv": "s1.pathway0_stem.bn.running_var",
        "res2_0_branch2a_w": "s2.pathway0_res0.branch2.a.weight",
        "res2_0_branch2a_bn_rm": "s2.pathway0_res0.branch2.a_bn.running_mean",
        "res3_1_branch1_w": "s3.pathway0_res1.branch1.weight",
        "res3_1_branch1_bn_b": "s3.pathway0_res1.branch1_bn.bias",
        "t_res2_0_branch2c_w": "s2.pathway1_res0.branch2.c.weight",
        "t_conv1_w": "s1.pathway1_stem.conv.weight",
        "t_pool1_subsample_w": "s1_fuse.conv_f2s.weight",
        "t_pool1_subsample_bn_s": "s1_fuse.bn.weight",
        "t_res2_3_branch2c_bn_subsample_w": "s2_fuse.conv_f2s.weight",
        "nonlocal_conv3_1_theta_w": "s3.pathway0_nonlocal1.conv_theta.weight",
        "nonlocal_conv3_1_bn_s": "s3.pathway0_nonlocal1.bn.weight",
        "pred_w": "head.projection.weight",
        "pred_b": "head.projection.bias",
    }
    for c2, torch_name in pairs.items():
        assert c2_import.convert_c2_name(c2) == torch_name, c2


def _torch_to_c2(name):
    """Test-local inverse mapping for single-pathway ResNet names."""
    import re

    m = re.fullmatch(
        r"s(\d+)\.pathway0_res(\d+)\.branch2\.([a-c])_bn\.(\w+)", name
    )
    leaf = {"weight": "s", "bias": "b", "running_mean": "rm",
            "running_var": "riv"}
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch2{m.group(3)}_bn_" + leaf[m.group(4)]
    m = re.fullmatch(r"s(\d+)\.pathway0_res(\d+)\.branch2\.([a-c])\.weight", name)
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch2{m.group(3)}_w"
    m = re.fullmatch(r"s(\d+)\.pathway0_res(\d+)\.branch1_bn\.(\w+)", name)
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch1_bn_" + leaf[m.group(3)]
    m = re.fullmatch(r"s(\d+)\.pathway0_res(\d+)\.branch1\.weight", name)
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch1_w"
    m = re.fullmatch(r"s1\.pathway0_stem\.bn\.(\w+)", name)
    if m:
        return "res_conv1_bn_" + leaf[m.group(1)]
    if name == "s1.pathway0_stem.conv.weight":
        return "conv1_w"
    if name == "head.projection.weight":
        return "pred_w"
    if name == "head.projection.bias":
        return "pred_b"
    raise KeyError(name)


def test_resnet_c2_roundtrip(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = jax.tree_util.tree_map(
        lambda a: np.random.default_rng(0).normal(size=a.shape).astype(a.dtype)
        if a.ndim else a,
        model.init(jax.random.PRNGKey(0), x, train=False),
    )

    # Export every leaf as a Caffe2-named blob in Caffe2 layouts.
    blobs = {"model_iter": np.int64(1000), "lr": np.float32(0.1)}
    for kind in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables[kind])[0]
        for path, leaf in flat:
            names = [str(k.key) for k in path]
            tname = torch_import._flax_path_to_torch(names)
            arr = np.asarray(leaf)
            if names[-1] == "kernel" and arr.ndim == 5:
                arr = arr.transpose(4, 3, 0, 1, 2)
            elif names[-1] == "kernel" and arr.ndim == 2:
                arr = arr.T
            blobs[_torch_to_c2(tname)] = arr
    ckpt = tmp_path / "model_final.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    sd = c2_import.load_c2_state_dict(str(ckpt))
    new_vars, missing, _ = torch_import.convert_state_dict(
        sd, variables, strict=True
    )
    for kind in ("params", "batch_stats"):
        for (p1, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables[kind])[0],
            jax.tree_util.tree_flatten_with_path(new_vars[kind])[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6,
                err_msg=f"{kind}: " + "/".join(str(k.key) for k in p1),
            )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
import pytest  # noqa: E402  (slow-mark only)
pytestmark = pytest.mark.slow
