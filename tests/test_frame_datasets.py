import json
import os

import numpy as np
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.data.build import build_dataset
import pmv_tpu.data  # noqa: F401  (register)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_frames(d, video, n, size=(32, 24)):
    paths = []
    os.makedirs(d / video, exist_ok=True)
    for i in range(n):
        p = d / video / f"{i:05d}.jpg"
        Image.new("RGB", size, (i * 5 % 255, 10, 10)).save(p)
        paths.append(f"{video}/{i:05d}.jpg")
    return paths


@pytest.fixture
def ssv2_root(tmp_path):
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    labels = {"Doing thing 1": "0", "Doing thing 2": "1"}
    (tmp_path / "something-something-v2-labels.json").write_text(
        json.dumps(labels)
    )
    vids = []
    for i, vid in enumerate(["1001", "1002"]):
        paths = _write_frames(frames_dir, vid, 12)
        vids.append((vid, paths, f"Doing thing {i + 1}"))
    (tmp_path / "something-something-v2-train.json").write_text(
        json.dumps([
            {"id": vid, "template": f"[{tpl}]".replace("[", "").replace("]", "")}
            for vid, _, tpl in vids
        ])
    )
    rows = ["original_vido_id video_id frame_id path labels"]
    for vid, paths, _ in vids:
        for j, p in enumerate(paths):
            rows.append(f"{vid} {vid} {j} {p} \"\"")
    (tmp_path / "train.csv").write_text("\n".join(rows) + "\n")
    return tmp_path, frames_dir


def test_ssv2_dataset(ssv2_root):
    root, frames = ssv2_root
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(frames)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TRAIN_JITTER_SCALES = [18, 20]
    ds = build_dataset("ssv2", cfg, "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["frames"].shape == (4, 16, 16, 3)
    assert s["label"] in (0, 1)


def test_charades_dataset(tmp_path):
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rows = ["original_vido_id video_id frame_id path labels"]
    paths = _write_frames(frames_dir, "c1", 10)
    for j, p in enumerate(paths):
        lbl = "0,2" if j < 5 else "1"
        rows.append(f"c1 c1 {j} {p} \"{lbl}\"")
    (tmp_path / "train.csv").write_text("\n".join(rows) + "\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(frames_dir)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TRAIN_JITTER_SCALES = [18, 20]
    cfg.MODEL.NUM_CLASSES = 5
    ds = build_dataset("charades", cfg, "train")
    s = ds[0]
    assert s["frames"].shape == (4, 16, 16, 3)
    assert s["label"].shape == (5,)
    assert s["label"].max() == 1.0


def test_imagenet_dataset(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (40, 40), (100, 50, 25)).save(img_dir / "a.jpg")
    (tmp_path / "train.txt").write_text("a.jpg 3\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(img_dir)
    cfg.DATA.TRAIN_CROP_SIZE = 16
    ds = build_dataset("imagenet", cfg, "train")
    s = ds[0]
    assert s["frames"].shape == (1, 16, 16, 3)
    assert s["label"] == 3


def test_sth_dataset(tmp_path):
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for vid, n in (("vidA", 10), ("vidB", 14)):
        _write_frames(frames_dir, vid, n)
    (tmp_path / "somesomev1_rgb_train_split.txt").write_text(
        "vidA 10 0\nvidB 14 1\n"
    )
    (tmp_path / "somesomev1_rgb_validation_split.txt").write_text(
        "vidA 10 0\nvidB 14 1\n"
    )
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(frames_dir)
    cfg.DATA.LABEL_PATH_TEMPLATE = "somesomev1_rgb_{}_split.txt"
    cfg.DATA.IMAGE_TEMPLATE = "{:05d}.jpg"
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TRAIN_JITTER_SCALES = [18, 20]
    ds = build_dataset("sth", cfg, "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["frames"].shape == (4, 16, 16, 3)
    assert s["label"] == 0

    # Test mode: deterministic per-view segment positions, multi-view unroll.
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    ds_t = build_dataset("sth", cfg, "test")
    assert len(ds_t) == 4
    a = ds_t[0]["frames"]
    b = ds_t[1]["frames"]
    assert a.shape == (4, 16, 16, 3)
    assert not np.array_equal(a, b)  # different ensemble views


def test_charades_multilabel_train_e2e(tmp_path):
    """Full train() on Charades-style multi-label data: BCE steps + mAP
    eval epoch (the reference's MULTI_LABEL path end-to-end)."""
    from pmv_tpu.engine.train import train

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rows = ["original_vido_id video_id frame_id path labels"]
    for i in range(8):
        v = f"c{i}"
        paths = _write_frames(frames_dir, v, 10)
        for j, p in enumerate(paths):
            lbl = "0,2" if i % 2 == 0 else "1"
            rows.append(f'{v} {v} {j} {p} "{lbl}"')
    (tmp_path / "train.csv").write_text("\n".join(rows) + "\n")
    (tmp_path / "val.csv").write_text("\n".join(rows) + "\n")

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "charades"
    cfg.TEST.DATASET = "charades"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TEST.ENABLE = False
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(frames_dir)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.DATA.TRAIN_JITTER_SCALES = [18, 20]
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.LOSS_FUNC = "bce_logit"
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    import os

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    stats = train(cfg)
    assert stats is None or True  # reaching here = full loop ran


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
