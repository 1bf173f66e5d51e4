"""Demo: run action recognition over a video file and write an annotated copy.

Equivalent of the reference demo stack (`MViT/tools/demo_net.py`,
`slowfast/visualization/{demo_loader,predictor,async_predictor,
video_visualizer}.py`) on the TPU-native stack:

- the native FFmpeg reader replaces the OpenCV `VideoManager`;
- a jitted eval step replaces the cuda `Predictor`;
- decode/predict/annotate overlap through a 3-stage thread pipeline (the
  reference's `AsyncDemo` used mp.Queue processes — threads suffice here
  because decode is native and inference is a non-blocking device dispatch);
- PIL text overlay replaces the cv2 `VideoVisualizer`;
- output is written with the native AVI writer;
- webcam capture (`DEMO.WEBCAM >= 0`, reference `demo_loader.py`
  VideoManager source switch) streams through cv2.VideoCapture: frames
  accumulate into clip windows until the stream ends (a live camera runs
  until interrupted — headless hosts have no display loop to quit from).
"""

import os
import queue
import threading

import jax
import numpy as np

from pmv_tpu.data import transform
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
from pmv_tpu.utils import checkpoint as cu
from pmv_tpu.utils import logging as pmv_logging
from pmv_tpu.visualization import video_vis
from pmv_tpu.visualization.tensorboard_vis import get_class_names

logger = pmv_logging.get_logger(__name__)


def _cv2_stream_windows(cap, t, clip_len):
    """Yield (window_idx, [t frames RGB uint8]) from an opened
    cv2.VideoCapture until the stream ends. Each window spans clip_len
    consecutive captured frames, subsampled to t by linspace — the same
    geometry the file path uses."""
    import cv2

    idx = np.linspace(0, clip_len - 1, t).astype(np.int64)
    keep = set(idx.tolist())
    w = 0
    buf = []
    pos = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            return
        if pos in keep:
            buf.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        pos += 1
        if pos == clip_len:
            yield w, np.stack(buf)
            w += 1
            buf = []
            pos = 0


def demo(cfg):
    """Annotate DEMO.INPUT_VIDEO (or a DEMO.WEBCAM stream) with top-k
    predictions per clip window."""
    pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    use_webcam = cfg.DEMO.WEBCAM >= 0
    assert use_webcam or cfg.DEMO.INPUT_VIDEO, (
        "DEMO.INPUT_VIDEO must point at a video file (or set DEMO.WEBCAM)"
    )
    from pmv_tpu.native import binding

    cfg = cfg.clone()
    cfg.TEST.PROCESS = True
    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)

    reader = None if use_webcam else binding.VideoReader(cfg.DEMO.INPUT_VIDEO)
    size = cfg.DATA.TEST_CROP_SIZE
    t = cfg.DATA.NUM_FRAMES
    stride = cfg.DATA.SAMPLING_RATE

    example = {
        "frames": np.zeros((1, t, size, size, 3), np.uint8),
        "labels": np.zeros((1,), np.int64),
    }
    state, _ = steps.init_state(cfg, model, example, rng)
    state = cu.load_test_checkpoint(cfg, state)
    eval_step = jax.jit(steps.make_eval_step(cfg, model))

    class_names = (
        get_class_names(cfg.DEMO.LABEL_FILE_PATH)
        if cfg.DEMO.LABEL_FILE_PATH
        else []
    )

    clip_len = t * stride
    decode_q = queue.Queue(maxsize=2)
    pred_q = queue.Queue(maxsize=2)

    if use_webcam:
        import cv2

        cap = cv2.VideoCapture(cfg.DEMO.WEBCAM)
        assert cap.isOpened(), f"cannot open webcam {cfg.DEMO.WEBCAM}"
        if cfg.DEMO.DISPLAY_WIDTH > 0:
            cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.DEMO.DISPLAY_WIDTH)
        if cfg.DEMO.DISPLAY_HEIGHT > 0:
            cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.DEMO.DISPLAY_HEIGHT)
        src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        logger.info("Demo: webcam %d (%.1f fps)", cfg.DEMO.WEBCAM, src_fps)

        def decoder_stage():
            for item in _cv2_stream_windows(cap, t, clip_len):
                decode_q.put(item)
            cap.release()
            decode_q.put(None)
    else:
        n_windows = max(reader.num_frames // clip_len, 1)
        src_fps = reader.fps
        logger.info(
            "Demo: %s (%d frames, %.1f fps) -> %d windows",
            cfg.DEMO.INPUT_VIDEO, reader.num_frames, reader.fps, n_windows,
        )

        def decoder_stage():
            for w in range(n_windows):
                start = w * clip_len
                idx = np.linspace(
                    start, min(start + clip_len - 1, reader.num_frames - 1), t
                ).astype(np.int64)
                # Clip frames for the model at a short-side-scaled geometry.
                frames = reader.read_frames(idx)
                decode_q.put((w, frames))
            decode_q.put(None)

    def predict_stage():
        while True:
            item = decode_q.get()
            if item is None:
                pred_q.put(None)
                return
            w, frames = item
            net_in = transform.short_side_scale(
                frames.astype(np.float32), size
            )
            net_in = transform.uniform_crop(net_in, size, 1)
            preds = eval_step(
                state, np.clip(net_in, 0, 255).astype(np.uint8)[None]
            )
            pred_q.put(
                (w, frames, np.asarray(preds)[0].astype(np.float32))
            )

    def run_stage(fn):
        # Stage failures must surface in the main thread, not leave the
        # pipeline deadlocked on a queue that will never fill.
        def wrapped():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001
                pred_q.put(e)

        threading.Thread(target=wrapped, daemon=True).start()

    run_stage(decoder_stage)
    run_stage(predict_stage)

    out_frames = []
    while True:
        item = pred_q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        w, frames, preds = item
        for f in frames:
            out_frames.append(
                video_vis.draw_predictions(
                    f, preds, class_names,
                    top_k=max(cfg.DEMO.CLIP_VIS_SIZE, 1),
                    thres=cfg.DEMO.COMMON_CLASS_THRES
                    if cfg.DEMO.COMMON_CLASS_NAMES else 0.0,
                    num_classes=cfg.MODEL.NUM_CLASSES,
                )
            )
    if reader is not None:
        reader.close()

    out_path = cfg.DEMO.OUTPUT_FILE or os.path.join(
        cfg.OUTPUT_DIR, "demo_out.avi"
    )
    fps = cfg.DEMO.OUTPUT_FPS if cfg.DEMO.OUTPUT_FPS > 0 else int(
        max(src_fps, 1)
    )
    binding.write_test_video(out_path, np.stack(out_frames), fps=fps)
    logger.info("Demo output written to %s", out_path)
    return out_path
