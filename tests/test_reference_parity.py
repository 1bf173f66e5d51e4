"""Whole-model logit parity against the REAL reference implementation.

Builds the reference PyTorch models from /root/reference (via
tests/ref_stubs import shims), exports their state dicts through our torch
importer (`pmv_tpu/utils/torch_import.py`), and asserts our flax models
produce the same eval logits on the same input. This is the de-risking for
the 0.3% top-1 budget without checkpoint downloads
(reference: `MViT/slowfast/models/video_model_builder.py:1726-2171`,
`attention.py:314-461`, `Uniformer/slowfast/models/uniformer.py:252-526`).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from ref_loader import import_reference_models  # noqa: E402

from pmv_tpu.config import get_cfg  # noqa: E402
from pmv_tpu.models import build_model  # noqa: E402
from pmv_tpu.utils.torch_import import convert_state_dict  # noqa: E402

B, T, S = 2, 4, 32


def _export_torch(model):
    sd = model.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _run_ours(cfg, sd, frames_btHWc, strict=True, hw_switch=False):
    model = build_model(cfg, dtype=jnp.float32, hw_switch=hw_switch)
    x = jnp.asarray(frames_btHWc)
    from pmv_tpu.engine import steps

    inputs = steps.pack_pathways(cfg, x)
    if len(inputs) == 1:
        inputs = inputs[0]
    variables = jax.jit(
        lambda k: model.init(k, inputs, train=False)
    )(jax.random.PRNGKey(0))
    variables = {
        k: v for k, v in dict(variables).items()
        if k in ("params", "batch_stats")
    }
    new_vars, missing, _ = convert_state_dict(sd, variables, strict=strict)
    preds = model.apply(new_vars, inputs, train=False)
    return np.asarray(preds)


def _run_ref(ref_models, name, cfg, frames_btHWc, train=False):
    import torch

    torch.manual_seed(0)
    ctor = ref_models.MODEL_REGISTRY.get(name)
    m = ctor(cfg)
    m.train(train)
    x = torch.from_numpy(
        np.ascontiguousarray(
            np.transpose(frames_btHWc, (0, 4, 1, 2, 3))
        )
    ).float()  # [B, C, T, H, W]
    with torch.no_grad():
        from pmv_tpu.engine import steps as _s

        if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
            alpha = cfg.SLOWFAST.ALPHA
            inputs = [x[:, :, ::alpha], x]
        else:
            inputs = [x]
        out = m(inputs)
    return m, np.asarray(out.detach().numpy())


def _frames():
    rng = np.random.default_rng(0)
    return rng.standard_normal((B, T, S, S, 3)).astype(np.float32)


def _mvit_cfg(v2=True):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 11
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.NUM_FRAMES = T
    cfg.DATA.TRAIN_CROP_SIZE = S
    cfg.DATA.TEST_CROP_SIZE = S
    cfg.MVIT.DEPTH = 3
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2], [2, 1, 1, 1]]
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.MVIT.MODE = "conv"
    if v2:
        cfg.MVIT.CLS_EMBED_ON = False
        cfg.MVIT.USE_ABS_POS = False
        cfg.MVIT.REL_POS_SPATIAL = True
        cfg.MVIT.REL_POS_TEMPORAL = True
        cfg.MVIT.QKV_BIAS = True
        cfg.MVIT.RESIDUAL_POOLING = True
        cfg.MVIT.DIM_MUL_IN_ATT = True
    else:
        cfg.MVIT.CLS_EMBED_ON = True
        cfg.MVIT.USE_ABS_POS = True
        cfg.MVIT.SEP_POS_EMBED = True
        cfg.MVIT.REL_POS_SPATIAL = False
        cfg.MVIT.REL_POS_TEMPORAL = False
        cfg.MVIT.QKV_BIAS = True
        cfg.MVIT.RESIDUAL_POOLING = False
        cfg.MVIT.DIM_MUL_IN_ATT = False
    return cfg


def _assert_close(ours, ref, name, atol=2e-5):
    assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-4, err_msg=name)


def test_mvitv2_logit_parity():
    ref_models = import_reference_models("MViT")
    cfg = _mvit_cfg(v2=True)
    frames = _frames()
    m, ref_out = _run_ref(ref_models, "MViT", cfg, frames)
    ours = _run_ours(cfg, _export_torch(m), frames)
    _assert_close(ours, ref_out, "mvitv2")


def test_mvitv1_logit_parity():
    ref_models = import_reference_models("MViT")
    cfg = _mvit_cfg(v2=False)
    frames = _frames()
    m, ref_out = _run_ref(ref_models, "MViT", cfg, frames)
    ours = _run_ours(cfg, _export_torch(m), frames)
    _assert_close(ours, ref_out, "mvitv1")


def test_mvitv2_rect_switch_auto_parity():
    """Rect geometry with SWITCH_AUTO: both orientations must match the
    reference's dynamic pm branch (`video_model_builder.py:2075-2096`,
    `attention.py:414-435` table swap when grid H > W)."""
    import torch

    ref_models = import_reference_models("MViT")
    cfg = _mvit_cfg(v2=True)
    cfg.DATA.TRAIN_CROP_SIZE_RECT = [48, 32]  # H > W: swap active upright
    cfg.DATA.TRAIN_CROP_SIZE_RECT_SWITCH_AUTO = True
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((B, T, 48, 32, 3)).astype(np.float32)
    torch.manual_seed(0)
    m = ref_models.MViT(cfg)
    m.eval()
    x = torch.from_numpy(
        np.ascontiguousarray(np.transpose(frames, (0, 4, 1, 2, 3)))
    ).float()
    with torch.no_grad():
        ref_land = m([x])  # upright program (grid 12x8, tables swapped)
        ref_pm = m([x], pm=[torch.ones(B, dtype=torch.bool)])
    sd = _export_torch(m)
    ours_land = _run_ours(cfg, sd, frames)
    _assert_close(ours_land, np.asarray(ref_land.numpy()), "rect-upright")
    # pm: reference transposes inside forward; our portrait specialization
    # takes the engine-transposed batch.
    ours_pm = _run_ours(
        cfg, sd, np.swapaxes(frames, 2, 3), hw_switch=True
    )
    _assert_close(ours_pm, np.asarray(ref_pm.numpy()), "rect-pm")


def _x3d_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 11
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.RESNET.NUM_GROUPS = 1
    cfg.RESNET.WIDTH_PER_GROUP = 64
    cfg.RESNET.STRIDE_1X1 = False
    cfg.RESNET.INPLACE_RELU = True
    cfg.RESNET.DEPTH = 50
    cfg.DATA.NUM_FRAMES = T
    cfg.DATA.TRAIN_CROP_SIZE = S
    cfg.DATA.TEST_CROP_SIZE = S
    cfg.X3D.DIM_C1 = 12
    cfg.X3D.WIDTH_FACTOR = 1.0
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 24
    cfg.X3D.BOTTLENECK_FACTOR = 1.0
    cfg.X3D.CHANNELWISE_3x3x3 = True
    return cfg


def test_x3d_logit_parity():
    ref_models = import_reference_models("MViT")
    cfg = _x3d_cfg()
    frames = _frames()
    m, ref_out = _run_ref(ref_models, "X3D", cfg, frames)
    ours = _run_ours(cfg, _export_torch(m), frames)
    _assert_close(ours, ref_out, "x3d")


def _slowfast_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 11
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.SLOWFAST.ALPHA = 2
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO = 2
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 3
    cfg.NONLOCAL.LOCATION = [[[], []], [[], []], [[], []], [[], []]]
    cfg.NONLOCAL.GROUP = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.NONLOCAL.INSTANTIATION = "dot_product"
    cfg.DATA.NUM_FRAMES = T
    cfg.DATA.TRAIN_CROP_SIZE = S
    cfg.DATA.TEST_CROP_SIZE = S
    return cfg


def test_slowfast_logit_parity():
    ref_models = import_reference_models("MViT")
    cfg = _slowfast_cfg()
    frames = _frames()
    m, ref_out = _run_ref(ref_models, "SlowFast", cfg, frames)
    ours = _run_ours(cfg, _export_torch(m), frames)
    _assert_close(ours, ref_out, "slowfast")


def _uniformer_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "Uniformer"
    cfg.MODEL.ARCH = "uniformer"
    cfg.MODEL.NUM_CLASSES = 11
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.NUM_FRAMES = T
    cfg.DATA.TRAIN_CROP_SIZE = S
    cfg.DATA.TEST_CROP_SIZE = S
    cfg.UNIFORMER.EMBED_DIM = [8, 16, 32, 64]
    cfg.UNIFORMER.DEPTH = [1, 1, 2, 1]
    cfg.UNIFORMER.HEAD_DIM = 16
    cfg.UNIFORMER.MLP_RATIO = 4
    cfg.UNIFORMER.DROPOUT_RATE = 0.0
    cfg.UNIFORMER.ATTENTION_DROPOUT_RATE = 0.0
    cfg.UNIFORMER.DROP_DEPTH_RATE = 0.0
    cfg.UNIFORMER.SPLIT = False
    cfg.UNIFORMER.STD = False
    cfg.UNIFORMER.PRETRAIN_NAME = ""
    return cfg


def test_uniformer_logit_parity():
    ref_models = import_reference_models("Uniformer")
    cfg = _uniformer_cfg()
    frames = _frames()
    import torch

    torch.manual_seed(0)
    m = ref_models.Uniformer(cfg)
    m.eval()
    x = torch.from_numpy(
        np.ascontiguousarray(np.transpose(frames, (0, 4, 1, 2, 3)))
    ).float()
    with torch.no_grad():
        ref_out = m([x])
    ref_out = np.asarray(ref_out.detach().numpy())
    # Uniformer eval (BN running stats untouched in eval): parity vs our
    # train=False apply with imported batch_stats.
    ours = _run_ours(cfg, _export_torch(m), frames)
    _assert_close(ours, ref_out, "uniformer", atol=1e-4)


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
