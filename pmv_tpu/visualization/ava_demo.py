"""AVA-style demo with precomputed person boxes.

Equivalent of the reference's
`slowfast/visualization/ava_demo_precomputed_boxes.py`
(AVAVisualizerWithPrecomputedBox): person boxes come from a csv
(`DEMO.PREDS_BOXES`, AVA list format), each keyframe's clip runs through the
detection model (RoIAlign head), and the video is re-rendered with per-box
action labels.

TPU-native differences: the native FFmpeg reader replaces the cv2 capture
loop, a single jitted detection step replaces the cuda forward, and frames
are annotated with PIL. Every output frame carries the predictions of its
nearest-preceding keyframe (the reference's draw_video interpolation
behavior).
"""

import os

import jax
import numpy as np

from pmv_tpu.data import transform
from pmv_tpu.data.ava import MAX_BOXES, get_sequence, parse_bboxes_file
from pmv_tpu.visualization import video_vis
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
from pmv_tpu.utils import checkpoint as cu
from pmv_tpu.utils import logging as pmv_logging
from pmv_tpu.visualization.tensorboard_vis import get_class_names

logger = pmv_logging.get_logger(__name__)


def ava_demo(cfg):
    """Render DEMO.INPUT_VIDEO with action predictions for the person boxes
    listed in DEMO.PREDS_BOXES. Returns the output path."""
    pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    assert cfg.DEMO.INPUT_VIDEO and cfg.DEMO.PREDS_BOXES
    from pmv_tpu.native import binding

    cfg = cfg.clone()
    cfg.DETECTION.ENABLE = True

    reader = binding.VideoReader(cfg.DEMO.INPUT_VIDEO)
    fps = max(reader.fps, 1.0)
    total = reader.num_frames
    video_name = os.path.splitext(os.path.basename(cfg.DEMO.INPUT_VIDEO))[0]

    by_video = parse_bboxes_file(
        cfg.DEMO.PREDS_BOXES, is_gt=False,
        detect_thresh=cfg.AVA.DETECTION_SCORE_THRESH,
    )
    if video_name in by_video:
        boxes_by_sec = by_video[video_name]
    elif len(by_video) == 1:
        boxes_by_sec = next(iter(by_video.values()))
    else:
        raise KeyError(
            f"{video_name} not in {cfg.DEMO.PREDS_BOXES} "
            f"(has {sorted(by_video)[:5]}...)"
        )

    crop = cfg.DATA.TEST_CROP_SIZE
    t = cfg.DATA.NUM_FRAMES
    stride = cfg.DATA.SAMPLING_RATE
    seq_half = t * stride // 2

    model = build_model(cfg)
    example = {
        "frames": np.zeros((1, t, crop, crop, 3), np.uint8),
        "labels": np.zeros((1, MAX_BOXES, cfg.MODEL.NUM_CLASSES), np.float32),
        "boxes": np.zeros((1, MAX_BOXES, 4), np.float32),
        "box_mask": np.zeros((1, MAX_BOXES), bool),
    }
    state, _ = steps.init_state(cfg, model, example, jax.random.PRNGKey(0))
    state = cu.load_test_checkpoint(cfg, state)

    preprocess = steps.make_eval_preprocess_fn(cfg)

    @jax.jit
    def det_step(state, frames, boxes, box_mask):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        x = preprocess(frames)
        xs = steps.pack_pathways(cfg, x)
        if len(xs) == 1:
            xs = xs[0]
        return model.apply(
            variables, xs, train=False, boxes=boxes, box_mask=box_mask
        )

    class_names = (
        get_class_names(cfg.DEMO.LABEL_FILE_PATH)
        if cfg.DEMO.LABEL_FILE_PATH
        else []
    )

    def name_of(label_idx):
        # csv labels are 1-based AVA ids; display names index from 0
        # (reference shifts by -1, `ava_demo_precomputed_boxes.py:435`).
        i = label_idx - 1
        return class_names[i] if 0 <= i < len(class_names) else str(label_idx)

    # Predict per keyframe.
    per_keyframe = {}  # keyframe_idx -> (orig-pixel boxes, text lines/box)
    for sec in sorted(boxes_by_sec):
        box_list = list(boxes_by_sec[sec].values())
        if not box_list:
            continue
        kf = int(round((sec - cfg.DEMO.STARTING_SECOND) * fps))
        if kf < 0 or kf >= total:
            continue
        norm = np.array([b[0] for b in box_list], np.float32)[:MAX_BOXES, :4]
        seq = get_sequence(kf, seq_half, stride, total)[:t]
        frames = reader.read_frames(seq).astype(np.float32)
        scaled = transform.short_side_scale(frames, crop)
        h, w = scaled.shape[1:3]
        y0 = max((h - crop) // 2, 0)
        x0 = max((w - crop) // 2, 0)
        clip = scaled[:, y0 : y0 + crop, x0 : x0 + crop]
        px = norm * np.array([w, h, w, h], np.float32)
        px -= np.array([x0, y0, x0, y0], np.float32)
        px = np.clip(px, 0, crop - 1)

        n = len(px)
        boxes_in = np.zeros((MAX_BOXES, 4), np.float32)
        boxes_in[:n] = px
        mask = np.zeros((MAX_BOXES,), bool)
        mask[:n] = True
        scores = np.asarray(
            det_step(
                state,
                np.clip(clip, 0, 255).astype(np.uint8)[None],
                boxes_in[None],
                mask[None],
            )
        )[0].astype(np.float32)

        orig_px = norm * np.array(
            [reader.width, reader.height, reader.width, reader.height],
            np.float32,
        )
        labels = []
        for i in range(n):
            top = np.argsort(scores[i])[::-1][: cfg.DEMO.NUM_VIS_INSTANCES]
            labels.append(
                [(int(j), name_of(j + 1), float(scores[i, j])) for j in top]
            )
        per_keyframe[kf] = (orig_px[:n], labels)
        logger.info("keyframe sec %d: %d boxes", sec, n)

    # Render: every frame carries its nearest-preceding keyframe's boxes.
    kf_sorted = sorted(per_keyframe)
    out_frames = []
    cur = -1
    chunk = 256
    for start in range(0, total, chunk):
        idx = np.arange(start, min(start + chunk, total))
        frames = reader.read_frames(idx)
        for off, fidx in enumerate(idx):
            while cur + 1 < len(kf_sorted) and kf_sorted[cur + 1] <= fidx:
                cur += 1
            f = frames[off]
            if cur >= 0:
                boxes, labels = per_keyframe[kf_sorted[cur]]
                f = video_vis.draw_boxes(
                    f, boxes, labels, num_classes=cfg.MODEL.NUM_CLASSES
                )
            out_frames.append(f)
    reader.close()

    out_path = cfg.DEMO.OUTPUT_FILE or os.path.join(
        cfg.OUTPUT_DIR, "ava_demo_out.avi"
    )
    out_fps = cfg.DEMO.OUTPUT_FPS if cfg.DEMO.OUTPUT_FPS > 0 else int(fps)
    binding.write_test_video(out_path, np.stack(out_frames), fps=out_fps)
    logger.info("AVA demo output written to %s", out_path)
    return out_path
