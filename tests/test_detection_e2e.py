"""End-to-end AVA detection: train steps + mAP eval through the engine."""

import os

import jax
import numpy as np
import pytest

from pmv_tpu.config import get_cfg
import pmv_tpu.data  # noqa: F401


@pytest.fixture
def ava_cfg(tmp_path):
    from PIL import Image

    frames = tmp_path / "frames"
    lists = tmp_path / "frame_lists"
    ann = tmp_path / "annotations"
    for d in (frames, lists, ann):
        d.mkdir()
    rows = ["original_vido_id video_id frame_id path labels"]
    ann_rows = []
    for v in ("vidA", "vidB"):
        os.makedirs(frames / v)
        for i in range(80):
            p = f"{v}/{i:06d}.jpg"
            Image.new("RGB", (48, 48), (i % 255, 40, 40)).save(frames / p)
            rows.append(f'{v} 0 {i} {p} ""')
        ann_rows.append(f"{v},902,0.2,0.2,0.8,0.8,1,0")
        ann_rows.append(f"{v},903,0.1,0.1,0.5,0.5,3,0")
    (lists / "train.csv").write_text("\n".join(rows) + "\n")
    (lists / "val.csv").write_text("\n".join(rows) + "\n")
    (ann / "ava_train_v2.2.csv").write_text("\n".join(ann_rows) + "\n")
    # Predicted-box files carry a detection score in the last column.
    pred_rows = [r.rsplit(",", 1)[0] + ",0.95" for r in ann_rows]
    (ann / "ava_val_predicted_boxes.csv").write_text(
        "\n".join(pred_rows) + "\n"
    )

    cfg = get_cfg()
    cfg.AVA.FRAME_DIR = str(frames)
    cfg.AVA.FRAME_LIST_DIR = str(lists)
    cfg.AVA.ANNOTATION_DIR = str(ann)
    cfg.TRAIN.DATASET = "ava"
    cfg.TEST.DATASET = "ava"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 4
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.MODEL.LOSS_FUNC = "bce_logit"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2, 2]] * 4
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.SLOWFAST.ALPHA = 4
    cfg.DETECTION.ENABLE = True
    cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
    cfg.DETECTION.ROI_XFORM_RESOLUTION = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.DATA_LOADER.NUM_WORKERS = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def test_detection_train_step(ava_cfg):
    from pmv_tpu.data.loader import construct_loader
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    import jax.numpy as jnp

    cfg = ava_cfg
    loader = construct_loader(cfg, "train")
    batch = next(iter(loader))
    model = build_model(cfg, dtype=jnp.float32)
    # init with boxes
    x = batch["frames"].astype(np.float32)
    inputs = steps.pack_pathways(cfg, x)
    variables = model.init(
        jax.random.PRNGKey(0), inputs, train=False,
        boxes=jnp.asarray(batch["boxes"]),
        box_mask=jnp.asarray(batch["box_mask"]),
    )
    from pmv_tpu.engine.train_state import TrainState
    from pmv_tpu.models import optimizer as optim

    tx = optim.construct_optimizer(variables["params"], cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = jax.jit(steps.make_detection_train_step(cfg, model, tx))
    device_batch = {
        "frames": jnp.asarray(batch["frames"]),
        "boxes": jnp.asarray(batch["boxes"]),
        "box_mask": jnp.asarray(batch["box_mask"]),
        "labels": jnp.asarray(batch["labels"]),
    }
    state, metrics = step(state, device_batch, jax.random.PRNGKey(0), 1e-3)
    assert not bool(metrics["nan"])
    assert float(metrics["loss"]) > 0


def test_detection_eval_map(ava_cfg):
    from pmv_tpu.engine.test import test as run_test

    cfg = ava_cfg
    cfg.TRAIN.ENABLE = False
    stats = run_test(cfg)
    assert "map" in stats
    assert 0.0 <= stats["map"] <= 1.0


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
