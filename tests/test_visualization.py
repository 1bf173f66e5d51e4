"""TensorBoard writer, Grad-CAM, and demo end-to-end on tiny models."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.models import build_model


def _tiny_x3d_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.DATA.TRAIN_CROP_SIZE = 16
    return cfg


def test_gradcam_x3d():
    from pmv_tpu.visualization.gradcam import gradcam, overlay_heatmap

    cfg = _tiny_x3d_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    maps, preds = gradcam(model, variables, x)
    assert maps.shape[0] == 2
    assert preds.shape == (2, 4)
    assert maps.min() >= 0.0 and maps.max() <= 1.0
    # Overlay on a fake frame.
    frame = np.zeros((16, 16, 3), np.uint8)
    out = overlay_heatmap(frame, maps[0, 0])
    assert out.shape == (16, 16, 3)


def test_gradcam_mvit_tokens():
    from pmv_tpu.visualization.gradcam import gradcam

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MVIT.DEPTH = 1
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1]]
    model = build_model(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    maps, preds = gradcam(model, variables, x)
    assert maps.shape[0] == 1
    assert preds.shape == (1, 3)


def test_tensorboard_writer(tmp_path):
    from pmv_tpu.visualization.tensorboard_vis import TensorboardWriter

    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE = True
    cfg.MODEL.NUM_CLASSES = 3
    writer = TensorboardWriter(cfg)
    writer.add_scalars({"Train/loss": 1.0}, global_step=0)
    preds = np.eye(3)[[0, 1, 2, 0]]
    labels = np.array([0, 1, 2, 1])
    writer.plot_eval(preds, labels, global_step=0)
    writer.add_video(np.zeros((1, 2, 8, 8, 3), np.uint8))
    writer.close()
    runs = [p for p in os.listdir(tmp_path) if p.startswith("runs-")]
    assert runs, "no event dir written"


def test_demo_end_to_end(tmp_path):
    from pmv_tpu.native import binding
    from pmv_tpu.visualization.demo import demo

    rng = np.random.default_rng(0)
    vid = tmp_path / "in.avi"
    binding.write_test_video(
        vid, rng.integers(0, 255, (24, 32, 24, 3), dtype=np.uint8), fps=12
    )
    cfg = _tiny_x3d_cfg()
    cfg.DEMO.ENABLE = True
    cfg.DEMO.INPUT_VIDEO = str(vid)
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "out.avi")
    cfg.DATA.SAMPLING_RATE = 2
    # Exercise the full task protocol: carried buffer frames, clip
    # skipping, and the thres vis mode (reference demo defaults).
    cfg.DEMO.BUFFER_SIZE = 1
    cfg.DEMO.NUM_CLIPS_SKIP = 1
    cfg.DEMO.NUM_VIS_INSTANCES = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    out = demo(cfg)
    assert os.path.exists(out)
    with binding.VideoReader(out) as vr:
        # Every source frame is written exactly once (24 in -> 24 out).
        assert vr.num_frames == 24


def test_demo_non_multiple_frame_count(tmp_path):
    """A source whose length is not a multiple of seq_len must not grow:
    the padded model-input tail is trimmed before writing (25 in -> 25
    out, not 32)."""
    from pmv_tpu.native import binding
    from pmv_tpu.visualization.demo import demo

    rng = np.random.default_rng(1)
    vid = tmp_path / "in25.avi"
    binding.write_test_video(
        vid, rng.integers(0, 255, (25, 32, 24, 3), dtype=np.uint8), fps=12
    )
    cfg = _tiny_x3d_cfg()
    cfg.DEMO.ENABLE = True
    cfg.DEMO.INPUT_VIDEO = str(vid)
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "out25.avi")
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DEMO.NUM_VIS_INSTANCES = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    out = demo(cfg)
    with binding.VideoReader(out) as vr:
        assert vr.num_frames == 25


def test_cv2_stream_windows(tmp_path):
    """Webcam-path window assembly, driven by a file-backed cv2 capture."""
    cv2 = pytest.importorskip("cv2")
    from pmv_tpu.native import binding
    from pmv_tpu.visualization.demo import _cv2_stream_windows

    rng = np.random.default_rng(0)
    vid = tmp_path / "stream.avi"
    binding.write_test_video(
        vid, rng.integers(0, 255, (25, 32, 24, 3), dtype=np.uint8), fps=12
    )
    cap = cv2.VideoCapture(str(vid))
    assert cap.isOpened()
    windows = list(_cv2_stream_windows(cap, seq_len=8))
    cap.release()
    # 25 frames -> 3 full 8-frame windows + a last-frame-padded tail.
    assert len(windows) == 4
    for frames, real_len in windows[:-1]:
        assert frames.shape == (8, 32, 24, 3)  # (T, H, W, C) from the file
        assert frames.dtype == np.uint8
        assert real_len == 8
    tail, tail_real = windows[-1]
    assert tail.shape == (8, 32, 24, 3)
    assert tail_real == 1  # 25 = 3*8 + 1 real frame in the tail window
    # Tail window: frame 24 repeated into the pad.
    assert (tail[1] == tail[-1]).all()


def test_visualize_tool_model_vis(tmp_path):
    """tools/visualization end-to-end: weight histograms, wrong-pred videos,
    Grad-CAM sweep (`MViT/tools/visualization.py:29-345` surface)."""
    from tools.visualization import visualize

    cfg = _tiny_x3d_cfg()
    cfg.TEST.DATASET = "synthetic"
    cfg.TEST.BATCH_SIZE = 2
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.ENABLE = True
    cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.MODEL_WEIGHTS = True
    cfg.TENSORBOARD.MODEL_VIS.INPUT_VIDEO = True
    cfg.TENSORBOARD.MODEL_VIS.LAYER_LIST = ["s1"]
    cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE = True
    visualize(cfg)
    runs = [p for p in os.listdir(tmp_path) if p.startswith("runs-")]
    assert runs, "no event dir written"


def test_visualize_tool_no_gradcam(tmp_path):
    """GRAD_CAM.ENABLE False takes the plain-forward branch."""
    from tools.visualization import visualize

    cfg = _tiny_x3d_cfg()
    cfg.TEST.DATASET = "synthetic"
    cfg.TEST.BATCH_SIZE = 2
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.ENABLE = False
    visualize(cfg)


def test_ava_demo_precomputed_boxes(tmp_path):
    from pmv_tpu.native import binding
    from pmv_tpu.visualization.ava_demo import ava_demo

    rng = np.random.default_rng(0)
    vid = tmp_path / "kf_video.avi"
    binding.write_test_video(
        vid, rng.integers(0, 255, (40, 32, 48, 3), dtype=np.uint8), fps=10
    )
    # AVA list csv: video_id,sec,x1,y1,x2,y2,label,score (normalized boxes).
    boxes_csv = tmp_path / "preds.csv"
    boxes_csv.write_text(
        "kf_video,901,0.1,0.1,0.6,0.8,1,0.99\n"
        "kf_video,901,0.5,0.2,0.9,0.9,2,0.95\n"
        "kf_video,903,0.2,0.2,0.7,0.7,1,0.98\n"
    )

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.DETECTION.ENABLE = True
    cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
    cfg.DETECTION.ROI_XFORM_RESOLUTION = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DEMO.ENABLE = True
    cfg.DEMO.INPUT_VIDEO = str(vid)
    cfg.DEMO.PREDS_BOXES = str(boxes_csv)
    cfg.DEMO.STARTING_SECOND = 900
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "ava_out.avi")
    cfg.OUTPUT_DIR = str(tmp_path)
    out = ava_demo(cfg)
    assert os.path.exists(out)
    with binding.VideoReader(out) as vr:
        assert vr.num_frames == 40


def test_ava_demo_gt_boxes_slowmo(tmp_path):
    """GT-box overlay + SLOWMO legs of the AVA draw protocol
    (`ava_demo_precomputed_boxes.py:270-296`): predictions repeat
    DEMO.SLOWMO times inside the draw range, so the output is strictly
    longer than the source; GT keyframes merge into the same clips."""
    from pmv_tpu.native import binding
    from pmv_tpu.visualization.ava_demo import ava_demo

    rng = np.random.default_rng(1)
    vid = tmp_path / "kf_video.avi"
    binding.write_test_video(
        vid, rng.integers(0, 255, (40, 32, 48, 3), dtype=np.uint8), fps=10
    )
    boxes_csv = tmp_path / "preds.csv"
    boxes_csv.write_text("kf_video,901,0.1,0.1,0.6,0.8,1,0.99\n")
    gt_csv = tmp_path / "gt.csv"
    gt_csv.write_text(
        "kf_video,901,0.15,0.1,0.65,0.8,2\n"
        "kf_video,902,0.2,0.2,0.8,0.8,3\n"
    )

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.DETECTION.ENABLE = True
    cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
    cfg.DETECTION.ROI_XFORM_RESOLUTION = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DEMO.ENABLE = True
    cfg.DEMO.INPUT_VIDEO = str(vid)
    cfg.DEMO.PREDS_BOXES = str(boxes_csv)
    cfg.DEMO.GT_BOXES = str(gt_csv)
    cfg.DEMO.SLOWMO = 3
    cfg.DEMO.STARTING_SECOND = 900
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "ava_out.avi")
    cfg.OUTPUT_DIR = str(tmp_path)
    out = ava_demo(cfg)
    with binding.VideoReader(out) as vr:
        # SLOWMO=3 repeats the pred draw range; every source frame still
        # appears, so the output is strictly longer than the input.
        assert vr.num_frames > 40


def test_visualize_predictions_path_offline(tmp_path):
    """TENSORBOARD.PREDICTIONS_PATH: offline plots from pickled preds."""
    import pickle

    from tools.visualization import visualize
    from pmv_tpu.config import get_cfg

    preds = np.eye(3)[[0, 1, 2, 0]]
    labels = np.array([0, 1, 2, 1])
    p = tmp_path / "preds.pkl"
    with open(p, "wb") as f:
        pickle.dump({"video_preds": preds, "video_labels": labels}, f)

    cfg = get_cfg()
    cfg.MODEL.NUM_CLASSES = 3
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.ENABLE = True
    cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE = True
    cfg.TENSORBOARD.PREDICTIONS_PATH = str(p)
    visualize(cfg)
    runs = [d for d in os.listdir(tmp_path) if d.startswith("runs-")]
    assert runs


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow


def test_video_vis_overlays():
    """Shared VideoVisualizer-parity renderer: deterministic class colors,
    lower-third predictions, labeled boxes."""
    import numpy as np

    from pmv_tpu.visualization import video_vis

    frame = np.zeros((64, 96, 3), np.uint8)
    preds = np.array([0.1, 0.7, 0.2], np.float32)
    out = video_vis.draw_predictions(frame, preds, ["a", "b", "c"], top_k=2)
    assert out.shape == frame.shape and out.dtype == np.uint8
    assert (out != 0).any()
    # Same class id -> same color; different -> different.
    assert video_vis.class_color(3, 10) == video_vis.class_color(3, 10)
    assert video_vis.class_color(3, 10) != video_vis.class_color(7, 10)
    out2 = video_vis.draw_boxes(
        frame, np.array([[8, 8, 60, 50]], np.float32),
        [[(2, "run", 0.9), (5, "jump", 0.4)]],
    )
    assert (out2 != 0).any()
