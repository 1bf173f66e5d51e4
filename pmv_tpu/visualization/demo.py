"""Demo: run action recognition over a video file and write an annotated copy.

Equivalent of the reference demo stack (`MViT/tools/demo_net.py`,
`slowfast/visualization/{demo_loader,predictor,async_predictor,
video_visualizer}.py`) on the TPU-native stack:

- the native FFmpeg reader replaces the OpenCV `VideoManager`
  (`demo_loader.py:21-130`); webcam capture (`DEMO.WEBCAM >= 0`) still
  streams through cv2.VideoCapture;
- a jitted eval step replaces the cuda `Predictor` — prediction is a
  single non-blocking device dispatch, so the reference's per-GPU
  `AsycnActionPredictor` process pool collapses into one thread;
- drawing runs on the `AsyncVis` multiprocess pool
  (`visualization/async_vis.py`, DEMO.NUM_VIS_INSTANCES workers) through
  the reference-parity `VideoVisualizer` (top-k/thres modes, keyframe
  fade, CLIP_VIS_SIZE draw range);
- clip windows follow the reference protocol (`demo_loader.py:228-266`):
  each task carries DATA.NUM_FRAMES x SAMPLING_RATE consecutive new
  frames plus DEMO.BUFFER_SIZE carried-over frames, every
  (NUM_CLIPS_SKIP+1)-th task is predicted and the rest pass through
  unannotated, and every source frame is written exactly once;
- output is written with the native AVI writer.
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
from pmv_tpu.visualization.async_vis import AsyncVis, TaskInfo
from pmv_tpu.visualization.video_vis import VideoVisualizer

logger = pmv_logging.get_logger(__name__)


def _cv2_stream_windows(cap, seq_len):
    """Yield ``(window, real_len)``: consecutive ``seq_len``-frame windows
    (RGB uint8 [T, H, W, 3]) from an opened cv2.VideoCapture until the
    stream ends. A final partial window is padded by repeating its last
    frame (model input only — the padded tail is trimmed before writing,
    matching the reference which never emits frames it didn't read)."""
    import cv2

    buf = []
    while True:
        ret, frame = cap.read()
        if not ret:
            if buf:
                real = len(buf)
                while len(buf) < seq_len:
                    buf.append(buf[-1])
                yield np.stack(buf), real
            return
        buf.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if len(buf) == seq_len:
            yield np.stack(buf), seq_len
            buf = []


def _file_windows(reader, seq_len):
    """Yield ``(window, real_len)`` windows from the native reader; the
    final partial window is padded with its last frame for the model input
    and trimmed again before writing."""
    total = reader.num_frames
    for start in range(0, total, seq_len):
        idx = np.minimum(np.arange(start, start + seq_len), total - 1)
        yield reader.read_frames(idx.astype(np.int64)), min(
            seq_len, total - start
        )


def build_video_visualizer(cfg):
    """VideoVisualizer from the DEMO config surface (`demo_net.py:39-54`)."""
    common_classes = (
        cfg.DEMO.COMMON_CLASS_NAMES if cfg.DEMO.LABEL_FILE_PATH else None
    )
    return VideoVisualizer(
        num_classes=cfg.MODEL.NUM_CLASSES,
        class_names_path=cfg.DEMO.LABEL_FILE_PATH,
        top_k=cfg.TENSORBOARD.MODEL_VIS.TOPK_PREDS,
        thres=cfg.DEMO.COMMON_CLASS_THRES,
        lower_thres=cfg.DEMO.UNCOMMON_CLASS_THRES,
        common_class_names=common_classes,
        colormap=cfg.TENSORBOARD.MODEL_VIS.COLORMAP,
        mode=cfg.DEMO.VIS_MODE,
    )


def demo(cfg):
    """Annotate DEMO.INPUT_VIDEO (or a DEMO.WEBCAM stream) with per-clip
    predictions. Returns the output path."""
    pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    use_webcam = cfg.DEMO.WEBCAM >= 0
    assert use_webcam or cfg.DEMO.INPUT_VIDEO, (
        "DEMO.INPUT_VIDEO must point at a video file (or set DEMO.WEBCAM)"
    )
    from pmv_tpu.native import binding

    cfg = cfg.clone()
    cfg.TEST.PROCESS = True
    t = cfg.DATA.NUM_FRAMES
    seq_len = t * cfg.DATA.SAMPLING_RATE
    assert cfg.DEMO.BUFFER_SIZE <= seq_len // 2, (
        "Buffer size cannot be greater than half of sequence length."
    )
    size = cfg.DATA.TEST_CROP_SIZE
    num_skip = cfg.DEMO.NUM_CLIPS_SKIP + 1

    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    example = {
        "frames": np.zeros((1, t, size, size, 3), np.uint8),
        "labels": np.zeros((1,), np.int64),
    }
    state, _ = steps.init_state(cfg, model, example, rng)
    state = cu.load_test_checkpoint(cfg, state)
    eval_step = jax.jit(steps.make_eval_step(cfg, model))

    async_vis = AsyncVis(
        build_video_visualizer(cfg), n_workers=cfg.DEMO.NUM_VIS_INSTANCES
    )

    if use_webcam:
        import cv2

        cap = cv2.VideoCapture(cfg.DEMO.WEBCAM)
        assert cap.isOpened(), f"cannot open webcam {cfg.DEMO.WEBCAM}"
        if cfg.DEMO.DISPLAY_WIDTH > 0:
            cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.DEMO.DISPLAY_WIDTH)
        if cfg.DEMO.DISPLAY_HEIGHT > 0:
            cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.DEMO.DISPLAY_HEIGHT)
        src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        reader = None
        windows = _cv2_stream_windows(cap, seq_len)
        logger.info("Demo: webcam %d (%.1f fps)", cfg.DEMO.WEBCAM, src_fps)
    else:
        reader = binding.VideoReader(cfg.DEMO.INPUT_VIDEO)
        src_fps = reader.fps
        windows = _file_windows(reader, seq_len)
        logger.info(
            "Demo: %s (%d frames, %.1f fps)",
            cfg.DEMO.INPUT_VIDEO, reader.num_frames, reader.fps,
        )

    decode_q = queue.Queue(maxsize=4)
    err_q = queue.Queue()

    def decoder_stage():
        buffer = None
        for i, (frames, real_len) in enumerate(windows):
            task = TaskInfo(
                num_buffer_frames=0 if buffer is None else len(buffer),
                img_height=frames.shape[1],
                img_width=frames.shape[2],
                crop_size=size,
                clip_vis_size=cfg.DEMO.CLIP_VIS_SIZE,
                num_pad_frames=len(frames) - real_len,
            )
            full = frames if buffer is None else np.concatenate(
                [buffer, frames]
            )
            task.add_frames(i, full)
            if cfg.DEMO.BUFFER_SIZE > 0:
                buffer = frames[-cfg.DEMO.BUFFER_SIZE:]
            decode_q.put(task)
        if use_webcam:
            cap.release()
        decode_q.put(None)

    n_tasks = [0]
    predict_done = threading.Event()

    def predict_stage():
        while True:
            task = decode_q.get()
            if task is None:
                predict_done.set()
                return
            if task.id % num_skip == 0:
                # linspace subsample over the whole window, reference
                # `visualization/utils.py:318` process_cv2_inputs.
                idx = np.linspace(
                    0, len(task.frames) - 1, t
                ).astype(np.int64)
                net_in = transform.short_side_scale(
                    task.frames[idx].astype(np.float32), size
                )
                net_in = transform.uniform_crop(net_in, size, 1)
                preds = eval_step(
                    state, np.clip(net_in, 0, 255).astype(np.uint8)[None]
                )
                task.action_preds = np.asarray(preds)[0].astype(np.float32)
            async_vis.get_indices_ls.append(task.id)
            async_vis.put(task)
            n_tasks[0] += 1

    def run_stage(fn):
        # Stage failures must surface in the main thread, not leave the
        # pipeline deadlocked on a queue that will never fill.
        def wrapped():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001
                err_q.put(e)
                predict_done.set()

        threading.Thread(target=wrapped, daemon=True).start()

    run_stage(decoder_stage)
    run_stage(predict_stage)

    out_frames = []
    received = 0
    while True:
        if not err_q.empty():
            raise err_q.get()
        if predict_done.is_set() and received == n_tasks[0]:
            break
        try:
            task = async_vis.get()
        except (queue.Empty, IndexError):
            import time

            time.sleep(0.01)
            continue
        received += 1
        emit = np.asarray(task.frames)[task.num_buffer_frames:]
        if task.num_pad_frames:
            emit = emit[: len(emit) - task.num_pad_frames]
        for f in emit:
            out_frames.append(np.ascontiguousarray(f, np.uint8))
    async_vis.shutdown()
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
