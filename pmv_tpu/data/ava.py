"""AVA action-detection dataset (`MViT/slowfast/datasets/ava_dataset.py` +
`ava_helper.py`).

Frame-based: per-video JPEG frame lists + keyframe box annotations. Each
sample is a clip centered on an annotated keyframe with its (padded,
fixed-count) person boxes and multi-hot action labels — static shapes for
the jitted detection step.

Annotation CSV rows (AVA v2.2): `video_id,sec,x1,y1,x2,y2,action_id,person`
with normalized [0, 1] box coordinates; frame lists use the shared
`original_vido_id video_id frame_id path labels` format.
"""

import os
import numpy as np

from pmv_tpu.data import transform
from pmv_tpu.data.build import DATASET_REGISTRY
from pmv_tpu.data.frame_datasets import _load_jpeg_frames, load_image_lists
from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)

_AVA_FPS = 30
_AVA_VALID_SECS = (902, 1798)
MAX_BOXES = 16


def _color_augmentation(frames, cfg, rng):
    """Reference AVA train color augmentation on [T, H, W, 3] RGB frames in
    [0, 255] (`ava_dataset.py:202-217` + `cv2_transform.py:240-298,636-741`):
    optional brightness/contrast/saturation blends in a random order (var
    0.4, one alpha per clip), then AlexNet PCA lighting jitter
    (alphastd 0.1, DATA.TRAIN_PCA_EIGVAL/EIGVEC). The reference applies
    these on [0,1] floats; scaling by 255 here is the same affine math."""
    f = frames.astype(np.float32)

    def gray(x):
        g = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        return g[..., None].repeat(3, axis=-1)

    if not cfg.AVA.TRAIN_PCA_JITTER_ONLY:
        ops = ["brightness", "contrast", "saturation"]
        for name in [ops[i] for i in rng.permutation(3)]:
            alpha = 1.0 + rng.uniform(-0.4, 0.4)
            if name == "brightness":
                target = np.zeros_like(f)
            elif name == "contrast":
                target = np.full_like(f, gray(f).mean())
            else:
                target = gray(f)
            f = f * alpha + target * (1.0 - alpha)
    # PCA lighting: rgb shift = sum_j eigvec[:, j] * alpha_j * eigval_j.
    alpha = rng.normal(0, 0.1, size=(1, 3)).astype(np.float32)
    eigvec = np.asarray(cfg.DATA.TRAIN_PCA_EIGVEC, np.float32)
    eigval = np.asarray(cfg.DATA.TRAIN_PCA_EIGVAL, np.float32).reshape(1, 3)
    rgb = np.sum(eigvec * alpha * eigval, axis=1)  # [3], RGB order
    return f + rgb * 255.0


def _scale_box_ratio(height, width, size):
    """The single scalar the reference multiplies boxes by for a short-side
    resize to ``size`` (`cv2_transform.py:106-131` scale_boxes /
    `:29-74` random_short_side_scale_jitter_list): the *long*-side ratio
    ``floor(long/short*size)/long``, which differs sub-pixel from
    ``size/short`` because of the floor. Returns 1.0 when no resize runs."""
    if (width <= height and width == size) or (
        height <= width and height == size
    ):
        return 1.0
    if width < height:
        return float(int(np.floor(float(height) / width * size))) / height
    return float(int(np.floor(float(width) / height * size))) / width


def _clip_boxes(boxes, height, width):
    """`cv2_transform.py:9-26` clip_boxes_to_image: clamp to [0, dim-1]."""
    boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0.0, width - 1.0)
    boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0.0, height - 1.0)
    return boxes


def _flip_boxes(boxes, im_width):
    """`cv2_transform.py:365-378` flip_boxes: x -> w - x - 1 with the
    x1/x2 swap."""
    flipped = boxes.copy()
    flipped[:, 0] = im_width - boxes[:, 2] - 1
    flipped[:, 2] = im_width - boxes[:, 0] - 1
    return flipped


def get_sequence(center_idx, half_len, sample_rate, num_frames):
    """Clip frame indices around a keyframe (`datasets/utils.py` get_sequence)."""
    seq = list(
        range(center_idx - half_len, center_idx + half_len, sample_rate)
    )
    return [min(max(i, 0), num_frames - 1) for i in seq]


def parse_bboxes_file(path, is_gt, detect_thresh, all_boxes=None):
    """Parse one AVA box-list csv (`ava_helper.py` parse_bboxes_file):
    rows `video_id,sec,x1,y1,x2,y2,label[,score]` with normalized
    coordinates. Accumulates into / returns
    `video -> sec -> {box4: [box4, [labels]]}` (label lists merged per
    unique box)."""
    if all_boxes is None:
        all_boxes = {}
    with open(path) as f:
        for line in f:
            row = line.strip().split(",")
            if len(row) < 7:
                continue
            if not is_gt and len(row) == 8:
                try:
                    score = float(row[7])
                    if score < detect_thresh:
                        continue
                except ValueError:
                    pass
            video, sec = row[0], int(float(row[1]))
            box = list(map(float, row[2:6]))
            label = -1 if row[6] == "" else int(row[6])
            key = tuple(box)
            all_boxes.setdefault(video, {}).setdefault(sec, {})
            if key not in all_boxes[video][sec]:
                all_boxes[video][sec][key] = [box, []]
            if label != -1:
                all_boxes[video][sec][key][1].append(label)
    return all_boxes


def load_boxes_and_labels(cfg, mode):
    """keyframe annotations: video -> sec -> [(box, [labels])]."""
    ann_dir = cfg.AVA.ANNOTATION_DIR
    files = (
        cfg.AVA.TRAIN_GT_BOX_LISTS + list(cfg.AVA.TRAIN_PREDICT_BOX_LISTS)
        if mode == "train"
        else cfg.AVA.TEST_PREDICT_BOX_LISTS
    )
    all_boxes = {}
    for filename in files:
        is_gt = filename in cfg.AVA.TRAIN_GT_BOX_LISTS
        parse_bboxes_file(
            os.path.join(ann_dir, filename), is_gt,
            cfg.AVA.DETECTION_SCORE_THRESH, all_boxes,
        )
    out = {}
    for video, secs in all_boxes.items():
        out[video] = {
            sec: list(d.values()) for sec, d in secs.items()
        }
    return out


@DATASET_REGISTRY.register(name="Ava")
class Ava:
    """AVA keyframe detection dataset (`ava_dataset.py`, cv2 backend).

    Known protocol deviation (recorded): the reference TEST split scales
    the short side and keeps the full RECT frame (no crop,
    `ava_dataset.py` test branch); static TPU batch shapes need one
    geometry, so val and test both center-crop to TEST_CROP_SIZE here
    (the reference's VAL protocol). Train aug covers scale-jitter +
    box-aware crop/flip + optional color/PCA jitter
    (AVA.TRAIN_USE_COLOR_AUGMENTATION)."""

    def __init__(self, cfg, mode):
        assert mode in ["train", "val", "test"]
        self.cfg = cfg
        self.mode = "train" if mode == "train" else "test"
        self._sample_rate = cfg.DATA.SAMPLING_RATE
        self._seq_len = cfg.DATA.NUM_FRAMES * self._sample_rate
        self._load()

    def _load(self):
        cfg = self.cfg
        lists = (
            cfg.AVA.TRAIN_LISTS if self.mode == "train" else cfg.AVA.TEST_LISTS
        )
        paths, _, keys = [], [], []
        for fl in lists:
            p, l, k = load_image_lists(
                os.path.join(cfg.AVA.FRAME_LIST_DIR, fl), cfg.AVA.FRAME_DIR
            )
            paths += p
            keys += k
        self._image_paths = paths
        self._video_names = keys
        name_to_idx = {n: i for i, n in enumerate(keys)}

        boxes_and_labels = load_boxes_and_labels(cfg, self.mode)
        self._keyframe_indices = []  # (video_idx, sec, center_frame_idx)
        self._keyframe_boxes = []
        for video, secs in boxes_and_labels.items():
            if video not in name_to_idx:
                continue
            vi = name_to_idx[video]
            for sec, box_list in sorted(secs.items()):
                if not box_list:
                    continue
                center = (sec - _AVA_VALID_SECS[0]) * _AVA_FPS
                center = min(max(center, 0), len(self._image_paths[vi]) - 1)
                self._keyframe_indices.append((vi, sec, center))
                self._keyframe_boxes.append(box_list)
        logger.info(
            "Constructed AVA %s: %d keyframes over %d videos",
            self.mode, len(self._keyframe_indices), len(keys),
        )

    def __len__(self):
        return len(self._keyframe_indices)

    @property
    def num_videos(self):
        return len(self)

    def __getitem__(self, idx):
        cfg = self.cfg
        rng = np.random.default_rng()
        video_idx, sec, center_idx = self._keyframe_indices[idx]
        seq = get_sequence(
            center_idx, self._seq_len // 2, self._sample_rate,
            len(self._image_paths[video_idx]),
        )
        frames = _load_jpeg_frames(
            [self._image_paths[video_idx][i] for i in seq]
        )

        box_list = self._keyframe_boxes[idx]
        boxes = np.array([b[0] for b in box_list], np.float32)[:, :4]
        labels = [b[1] for b in box_list]

        # Reference cv2-backend preprocessing, exact box math
        # (`ava_dataset.py:113-243` _images_and_boxes_preprocessing_cv2):
        # boxes to pixel coords of the decoded frame, clipped to the image,
        # then carried through every geometry op in pixel space.
        crop = cfg.DATA.TRAIN_CROP_SIZE if self.mode == "train" else cfg.DATA.TEST_CROP_SIZE
        h0, w0 = frames.shape[1:3]
        px = boxes * np.array([w0, h0, w0, h0], np.float32)
        px = _clip_boxes(px, h0, w0)
        if self.mode == "train":
            # Inverse-uniform short-side size (`cv2_transform.py:46`) —
            # NOT uniform in [min, max].
            lo, hi = cfg.DATA.TRAIN_JITTER_SCALES
            scale = int(round(1.0 / rng.uniform(1.0 / hi, 1.0 / lo)))
            px *= _scale_box_ratio(h0, w0, scale)
            frames = transform.short_side_scale(frames, scale)
            h, w = frames.shape[1:3]
            # randint's exclusive upper bound (`cv2_transform.py:424-428`):
            # the offset h-crop itself is never drawn.
            y0 = int(rng.integers(0, h - crop)) if h > crop else 0
            x0 = int(rng.integers(0, w - crop)) if w > crop else 0
            frames = frames[:, y0 : y0 + crop, x0 : x0 + crop]
            px -= np.array([x0, y0, x0, y0], np.float32)
            if rng.uniform() < 0.5:
                frames = frames[:, :, ::-1]
                px = _flip_boxes(px, crop)
            if cfg.AVA.TRAIN_USE_COLOR_AUGMENTATION:
                frames = _color_augmentation(frames, cfg, rng)
        else:
            px *= _scale_box_ratio(h0, w0, crop)
            frames = transform.short_side_scale(frames, crop)
            h, w = frames.shape[1:3]
            # Center crop with ceil offsets (`cv2_transform.py:188-189`).
            y0 = max(int(np.ceil((h - crop) / 2)), 0)
            x0 = max(int(np.ceil((w - crop) / 2)), 0)
            frames = frames[:, y0 : y0 + crop, x0 : x0 + crop]
            px -= np.array([x0, y0, x0, y0], np.float32)
            if cfg.AVA.TEST_FORCE_FLIP:
                # `ava_dataset.py` _test_force_flip (val/test, p=1).
                frames = frames[:, :, ::-1]
                px = _flip_boxes(px, crop)
        px = _clip_boxes(px, crop, crop)

        # Pad boxes / labels to MAX_BOXES (static shapes for jit).
        n = min(len(px), MAX_BOXES)
        boxes_out = np.zeros((MAX_BOXES, 4), np.float32)
        boxes_out[:n] = px[:n]
        mask = np.zeros((MAX_BOXES,), bool)
        mask[:n] = True
        label_out = np.zeros((MAX_BOXES, self.cfg.MODEL.NUM_CLASSES), np.float32)
        for i in range(n):
            for l in labels[i]:
                if 0 <= l < self.cfg.MODEL.NUM_CLASSES:
                    label_out[i, l] = 1.0

        # Original (normalized) boxes padded like `boxes` so batches stack;
        # the AVA evaluator consumes the box_mask-selected rows.
        ori_out = np.zeros((MAX_BOXES, 4), np.float32)
        ori_out[:n] = np.asarray(boxes, np.float32).reshape(-1, 4)[:n]
        return {
            "frames": np.ascontiguousarray(
                np.clip(frames, 0, 255).astype(np.uint8)
            ),
            "label": label_out,
            "boxes": boxes_out,
            "box_mask": mask,
            "ori_boxes": ori_out,
            "metadata": np.array([video_idx, sec], np.int64),
            "index": idx,
            "time": 0.0,
            "pm": False,
        }
