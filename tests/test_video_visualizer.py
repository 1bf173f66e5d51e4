"""VideoVisualizer + AsyncVis parity semantics (no model, fast tier).

Covers the reference protocol surface of
`slowfast/visualization/video_visualizer.py` and `async_predictor.py`:
top-k vs thres label modes, the per-class threshold array from common
class names, ground-truth overlays, keyframe fade / draw-range / slowmo
clip annotation, and the ordered multiprocess drawing pool.
"""

import queue

import numpy as np
import pytest

from pmv_tpu.visualization.async_vis import (
    AsyncVis,
    TaskInfo,
    draw_predictions,
    revert_scaled_boxes,
)
from pmv_tpu.visualization.video_vis import VideoVisualizer, _create_text_labels


def _vis(mode="top-k", **kw):
    kw.setdefault("num_classes", 5)
    kw.setdefault("top_k", 2)
    return VideoVisualizer(mode=mode, **kw)


def test_create_text_labels():
    names = ["walk", "run", "jump"]
    assert _create_text_labels([1, 2], [0.9, 0.2], names) == [
        "[0.90] run", "[0.20] jump",
    ]
    assert _create_text_labels([0], None, names, ground_truth=True) == [
        "[GT] walk",
    ]


def test_top_k_mode_picks_highest():
    v = _vis()
    classes, scores = v._top_labels(
        np.array([0.1, 0.5, 0.05, 0.3, 0.05], np.float32), ground_truth=False
    )
    assert classes[0] == [1, 3]
    assert scores[0] == pytest.approx([0.5, 0.3])


def test_thres_mode_per_class_threshold():
    # Classes named in common_class_names use thres; others lower_thres
    # (reference `_get_thres_array`, video_visualizer.py:657-677).
    v = VideoVisualizer(
        num_classes=3, thres=0.7, lower_thres=0.3,
        common_class_names=["1"], mode="thres",
    )
    np.testing.assert_allclose(v._thres_array, [0.3, 0.7, 0.3])
    classes, scores = v._top_labels(
        np.array([0.35, 0.65, 0.2], np.float32), ground_truth=False
    )
    # 0 clears its 0.3 bar; 1 misses its 0.7 bar; 2 misses 0.3.
    assert classes[0] == [0]


def test_thres_mode_defaults_all_common():
    v = VideoVisualizer(num_classes=4, thres=0.6, lower_thres=0.1,
                        mode="thres")
    np.testing.assert_allclose(v._thres_array, [0.6] * 4)


def test_ground_truth_labels_and_multi_instance():
    v = _vis()
    classes, scores = v._top_labels([[0, 2], [1]], ground_truth=True)
    assert classes == [[0, 2], [1]]
    assert scores == [None, None]


def test_draw_one_frame_modes():
    v = _vis()
    frame = np.zeros((48, 64, 3), np.uint8)
    preds = np.array([0.1, 0.8, 0.0, 0.1, 0.0], np.float32)
    out = v.draw_one_frame(frame, preds)
    assert out.shape == frame.shape and out.dtype == np.uint8
    assert (out != 0).any()
    # Detection: per-box rows; GT boxes draw dashed red.
    boxes = np.array([[4, 4, 30, 40], [34, 8, 60, 44]], np.float32)
    out2 = v.draw_one_frame(frame, np.stack([preds, preds]), bboxes=boxes)
    assert (out2 != 0).any()
    out3 = v.draw_one_frame(frame, [[1], [2]], bboxes=boxes,
                            ground_truth=True)
    # GT boxes are red-dominant where drawn.
    reds = out3[..., 0].astype(int) - out3[..., 1]
    assert reds.max() > 100


def test_draw_clip_range_passthrough_and_fade():
    v = _vis()
    frames = [np.zeros((32, 32, 3), np.uint8) for _ in range(8)]
    preds = np.array([0.9, 0.0, 0.0, 0.0, 0.0], np.float32)
    boxes = np.array([[2, 2, 28, 28]], np.float32)
    out = v.draw_clip_range(
        frames, preds[None], bboxes=boxes, keyframe_idx=4,
        draw_range=[2, 5],
    )
    assert len(out) == 8
    # Outside the draw range frames pass through untouched.
    assert (out[0] == 0).all() and (out[7] == 0).all()
    # Inside, the keyframe (full box alpha) is more drawn-on than the
    # fade-in edge.
    assert (out[4] != 0).sum() >= (out[2] != 0).sum()


def test_draw_clip_repeat_frame_slowmo():
    v = _vis()
    frames = [np.zeros((16, 16, 3), np.uint8) for _ in range(3)]
    preds = np.array([1.0, 0, 0, 0, 0], np.float32)
    out = v.draw_clip(frames, preds, repeat_frame=2)
    assert len(out) == 6  # DEMO.SLOWMO repeats every frame


def test_revert_scaled_boxes():
    # crop_size 8, source 32x64 (short side 32): scale back by 4.
    out = revert_scaled_boxes(8, np.array([[1, 1, 2, 2]], np.float32),
                              img_height=32, img_width=64)
    np.testing.assert_allclose(out, [[4, 4, 8, 8]])


def test_draw_predictions_buffer_split():
    v = _vis()
    task = TaskInfo(
        num_buffer_frames=2, img_height=32, img_width=32, crop_size=16,
        clip_vis_size=1,
    )
    task.add_frames(0, np.zeros((8, 32, 32, 3), np.uint8))
    task.action_preds = np.array([0.9, 0, 0, 0, 0], np.float32)
    out = draw_predictions(task, v)
    assert len(out) == 8
    # Buffer frames (the first 2) pass through untouched.
    assert (np.asarray(out[0]) == 0).all()
    assert (np.asarray(out[1]) == 0).all()


@pytest.mark.parametrize("n_workers", [0, 2])
def test_async_vis_ordered_results(n_workers):
    v = _vis()
    av = AsyncVis(v, n_workers=n_workers)
    try:
        ids = [0, 1, 2, 3]
        for i in ids:
            t = TaskInfo(crop_size=8, img_height=16, img_width=16,
                         clip_vis_size=1)
            t.add_frames(i, np.full((4, 16, 16, 3), i, np.uint8))
            # Odd tasks are skip pass-throughs (action_preds None).
            if i % 2 == 0:
                t.action_preds = np.array([1.0, 0, 0, 0, 0], np.float32)
            av.get_indices_ls.append(t.id)
            av.put(t)
        got = []
        import time

        deadline = time.time() + 30
        while len(got) < len(ids):
            try:
                got.append(av.get().id)
            except (queue.Empty, IndexError):
                assert time.time() < deadline, "AsyncVis results stalled"
                time.sleep(0.01)
        assert got == ids  # put order regardless of completion order
    finally:
        av.shutdown()
