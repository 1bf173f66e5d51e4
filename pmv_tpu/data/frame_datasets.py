"""Frame-list datasets: SSv2, Charades, ImageNet.

Host-side re-designs of `MViT/slowfast/datasets/{ssv2,charades,imagenet}.py`
on the channels-last pipeline: JPEG frames decode through PIL, spatial
sampling shares `pmv_tpu/data/spatial.py`, device-side augmentation happens
in the jitted step.

Frame-list format (`datasets/utils.py:327-367` load_image_lists): space-
separated rows `original_vido_id video_id frame_id path labels` with a
header line.
"""

import json
import os
import random
from collections import defaultdict

import numpy as np

from pmv_tpu.data import spatial
from pmv_tpu.data.build import DATASET_REGISTRY
from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)


def load_image_lists(frame_list_file, prefix=""):
    """-> (image_paths [video][frame], labels [video][frame])."""
    image_paths = defaultdict(list)
    labels = defaultdict(list)
    with open(frame_list_file, "r") as f:
        header = f.readline()
        assert header.startswith("original_vido_id"), (
            f"bad frame list header: {header!r}"
        )
        for line in f:
            row = line.split()
            assert len(row) == 5, f"bad frame-list row: {line!r}"
            video_name = row[0]
            path = row[3] if prefix == "" else os.path.join(prefix, row[3])
            image_paths[video_name].append(path)
            frame_labels = row[-1].replace('"', "")
            labels[video_name].append(
                [int(x) for x in frame_labels.split(",")] if frame_labels else []
            )
    keys = list(image_paths.keys())
    return [image_paths[k] for k in keys], [labels[k] for k in keys], keys


def _load_jpeg_frames(paths):
    """Decode JPEG paths -> float32 [T, H, W, 3]."""
    from PIL import Image

    frames = []
    for p in paths:
        with Image.open(p) as img:
            frames.append(np.asarray(img.convert("RGB"), np.float32))
    return np.stack(frames)


class _FrameListBase:
    """Shared multi-view bookkeeping + spatial sampling."""

    def __init__(self, cfg, mode):
        assert mode in ["train", "val", "test"]
        self.cfg = cfg
        self.mode = mode
        self._num_clips = (
            1
            if mode in ["train", "val"]
            else cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        )

    def _spatial_params(self, index):
        cfg = self.cfg
        if self.mode in ["train", "val"]:
            return -1, cfg.DATA.TRAIN_JITTER_SCALES[0], \
                cfg.DATA.TRAIN_JITTER_SCALES[1], cfg.DATA.TRAIN_CROP_SIZE
        spatial_idx = (
            self._spatial_temporal_idx[index] % cfg.TEST.NUM_SPATIAL_CROPS
            if cfg.TEST.NUM_SPATIAL_CROPS > 1
            else 1
        )
        return spatial_idx, cfg.DATA.TEST_CROP_SIZE, \
            cfg.DATA.TEST_CROP_SIZE, cfg.DATA.TEST_CROP_SIZE

    def _sample_and_pack(self, frames, index, label, rng):
        cfg = self.cfg
        spatial_idx, min_scale, max_scale, crop_size = self._spatial_params(index)
        scl = list(cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE)
        asp = list(cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE)
        frames = spatial.spatial_sampling(
            frames,
            spatial_idx=spatial_idx,
            min_scale=min_scale,
            max_scale=max_scale,
            crop_size=crop_size,
            random_horizontal_flip=cfg.DATA.RANDOM_FLIP and self.mode == "train",
            aspect_ratio=asp if (self.mode == "train" and asp) else None,
            scale=scl if (self.mode == "train" and scl) else None,
            rng=rng,
        )
        return {
            "frames": np.ascontiguousarray(
                np.clip(frames, 0, 255).astype(np.uint8)
            ),
            "label": label,
            "index": index,
            "time": 0.0,
            "pm": False,
        }


@DATASET_REGISTRY.register(name="Ssv2")
class Ssv2(_FrameListBase):
    """Something-Something V2 (`ssv2.py`): JSON labels + frame lists;
    segment-based temporal sampling (`ssv2.py:159-180`)."""

    def __init__(self, cfg, mode):
        super().__init__(cfg, mode)
        d = cfg.DATA.PATH_TO_DATA_DIR
        with open(os.path.join(d, "something-something-v2-labels.json")) as f:
            label_dict = json.load(f)
        split = "train" if mode == "train" else "validation"
        with open(os.path.join(d, f"something-something-v2-{split}.json")) as f:
            label_json = json.load(f)
        names, labels = [], []
        for video in label_json:
            template = video["template"].replace("[", "").replace("]", "")
            names.append(video["id"])
            labels.append(int(label_dict[template]))
        name_to_label = dict(zip(names, labels))

        csv_split = "train" if mode == "train" else "val"
        paths, _, keys = load_image_lists(
            os.path.join(d, f"{csv_split}.csv"), cfg.DATA.PATH_PREFIX
        )
        self._path_to_videos = []
        self._labels = []
        for vid_paths, key in zip(paths, keys):
            if key in name_to_label:
                self._path_to_videos.append(vid_paths)
                self._labels.append(name_to_label[key])
        # Multi-view unroll.
        self._path_to_videos = [
            p for p in self._path_to_videos for _ in range(self._num_clips)
        ]
        self._labels = [
            l for l in self._labels for _ in range(self._num_clips)
        ]
        self._spatial_temporal_idx = [
            i % self._num_clips for i in range(len(self._labels))
        ]
        logger.info("Constructed SSv2 %s: %d clips", mode, len(self._labels))

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def num_videos(self):
        return len(self)

    def _seq_frames(self, index, rng):
        """Per-segment sampling (`ssv2.py:159-180`)."""
        num_frames = self.cfg.DATA.NUM_FRAMES
        video_length = len(self._path_to_videos[index])
        seg_size = float(video_length - 1) / num_frames
        seq = []
        for i in range(num_frames):
            start = int(np.round(seg_size * i))
            end = int(np.round(seg_size * (i + 1)))
            if self.mode == "train":
                seq.append(int(rng.integers(start, end + 1)))
            else:
                seq.append((start + end) // 2)
        return seq

    def __getitem__(self, index):
        rng = np.random.default_rng()
        seq = self._seq_frames(index, rng)
        frames = _load_jpeg_frames(
            [self._path_to_videos[index][i] for i in seq]
        )
        return self._sample_and_pack(frames, index, self._labels[index], rng)


@DATASET_REGISTRY.register(name="Sth")
class Sth(_FrameListBase):
    """Something-Something V1, UniFormer flavor
    (`Uniformer/slowfast/datasets/sth.py:25-376`): space-separated rows
    `dir num_frames label` named by `DATA.LABEL_PATH_TEMPLATE.format(split)`
    (split is "train"/"validation"); frames are per-video JPEG directories
    addressed by `DATA.IMAGE_TEMPLATE`; TSN-style
    segment sampling whose test position depends on the ensemble view
    (`sth.py:134-161`)."""

    def __init__(self, cfg, mode):
        super().__init__(cfg, mode)
        split = "train" if mode == "train" else "validation"
        path_to_file = os.path.join(
            cfg.DATA.PATH_TO_DATA_DIR,
            cfg.DATA.LABEL_PATH_TEMPLATE.format(split),
        )
        self._path_to_videos = []
        self._num_frames = []
        self._labels = []
        with open(path_to_file) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 3:
                    continue
                for _ in range(self._num_clips):
                    self._path_to_videos.append(
                        os.path.join(cfg.DATA.PATH_PREFIX, parts[0])
                    )
                    self._num_frames.append(int(parts[1]))
                    self._labels.append(int(parts[2]))
        self._spatial_temporal_idx = [
            i % self._num_clips for i in range(len(self._labels))
        ]
        logger.info("Constructed Sth %s: %d clips", mode, len(self._labels))

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def num_videos(self):
        return len(self)

    def _seq_frames(self, index, rng):
        """Segment sampling (`sth.py:134-161`): train picks a random frame
        per segment; test picks a view-dependent deterministic position."""
        cfg = self.cfg
        num_frames = cfg.DATA.NUM_FRAMES
        video_length = self._num_frames[index]
        seg_size = float(video_length - 1) / num_frames
        seq = []
        if self.mode in ["train", "val"]:
            for i in range(num_frames):
                start = int(np.round(seg_size * i))
                end = int(np.round(seg_size * (i + 1)))
                seq.append(int(rng.integers(start, end + 1)))
        else:
            t_idx = (
                self._spatial_temporal_idx[index]
                // cfg.TEST.NUM_SPATIAL_CROPS
            )
            duration = seg_size / (cfg.TEST.NUM_ENSEMBLE_VIEWS + 1)
            for i in range(num_frames):
                start = int(np.round(seg_size * i))
                seq.append(start + int(duration * (t_idx + 1)))
        return [min(max(i, 0), video_length - 1) for i in seq]

    def __getitem__(self, index):
        rng = np.random.default_rng()
        seq = self._seq_frames(index, rng)
        template = os.path.join(
            self._path_to_videos[index], self.cfg.DATA.IMAGE_TEMPLATE
        )
        # The reference formats the raw segment indices into IMAGE_TEMPLATE
        # (`sth.py:229-237`); frame dumps are expected to match that naming.
        frames = _load_jpeg_frames([template.format(i) for i in seq])
        return self._sample_and_pack(frames, index, self._labels[index], rng)


@DATASET_REGISTRY.register(name="Charades")
class Charades(_FrameListBase):
    """Charades (`charades.py`): frame lists with per-frame multi-labels;
    strided window sampling; label = union over the sampled window."""

    def __init__(self, cfg, mode):
        super().__init__(cfg, mode)
        d = cfg.DATA.PATH_TO_DATA_DIR
        split = "train" if mode == "train" else "val"
        paths, labels, _ = load_image_lists(
            os.path.join(d, f"{split}.csv"), cfg.DATA.PATH_PREFIX
        )
        self._path_to_videos = [
            p for p in paths for _ in range(self._num_clips)
        ]
        self._frame_labels = [
            l for l in labels for _ in range(self._num_clips)
        ]
        self._spatial_temporal_idx = [
            i % self._num_clips for i in range(len(self._path_to_videos))
        ]
        logger.info(
            "Constructed Charades %s: %d clips", mode, len(self._path_to_videos)
        )

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def num_videos(self):
        return len(self)

    def _seq_frames(self, index, rng):
        """Strided clip window (`charades.py:113-152`)."""
        cfg = self.cfg
        num_frames = cfg.DATA.NUM_FRAMES
        sampling_rate = cfg.DATA.SAMPLING_RATE
        video_length = len(self._path_to_videos[index])
        clip_length = (num_frames - 1) * sampling_rate + 1
        if self.mode in ["train", "val"]:
            if clip_length > video_length:
                start = int(rng.integers(video_length - clip_length, 1))
            else:
                start = int(rng.integers(0, video_length - clip_length + 1))
        else:
            t_idx = self._spatial_temporal_idx[index] // cfg.TEST.NUM_SPATIAL_CROPS
            gap = float(max(video_length - clip_length, 0)) / max(
                cfg.TEST.NUM_ENSEMBLE_VIEWS - 1, 1
            )
            start = int(round(gap * t_idx))
        seq = [
            max(min(start + i * sampling_rate, video_length - 1), 0)
            for i in range(num_frames)
        ]
        return seq

    def __getitem__(self, index):
        rng = np.random.default_rng()
        seq = self._seq_frames(index, rng)
        frames = _load_jpeg_frames(
            [self._path_to_videos[index][i] for i in seq]
        )
        # Multi-label binary vector over the sampled window.
        label = np.zeros((self.cfg.MODEL.NUM_CLASSES,), np.float32)
        for i in seq:
            for l in self._frame_labels[index][i]:
                label[l] = 1.0
        out = self._sample_and_pack(frames, index, 0, rng)
        out["label"] = label
        return out


@DATASET_REGISTRY.register(name="Imagenet")
class Imagenet:
    """ImageNet (`imagenet.py`): `<split>.txt` rows `relpath label`; images
    treated as 1-frame videos so the shared pipeline applies."""

    def __init__(self, cfg, mode):
        assert mode in ["train", "val", "test"]
        self.cfg = cfg
        self.mode = "val" if mode == "test" else mode
        d = cfg.DATA.PATH_TO_DATA_DIR
        list_file = os.path.join(d, f"{self.mode}.txt")
        self._paths, self._labels = [], []
        with open(list_file) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 2:
                    continue
                self._paths.append(os.path.join(cfg.DATA.PATH_PREFIX, parts[0]))
                self._labels.append(int(parts[1]))
        self._num_clips = 1
        self._spatial_temporal_idx = [0] * len(self._paths)

    def __len__(self):
        return len(self._paths)

    @property
    def num_videos(self):
        return len(self)

    def __getitem__(self, index):
        rng = np.random.default_rng()
        frames = _load_jpeg_frames([self._paths[index]])
        cfg = self.cfg
        if self.mode == "train":
            scl = list(cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE) or [0.08, 1.0]
            asp = list(cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE) or [0.75, 4 / 3]
            frames = spatial.spatial_sampling(
                frames, spatial_idx=-1,
                crop_size=cfg.DATA.TRAIN_CROP_SIZE,
                aspect_ratio=asp, scale=scl, rng=rng,
            )
        else:
            frames = spatial.spatial_sampling(
                frames, spatial_idx=1,
                min_scale=cfg.DATA.TEST_CROP_SIZE,
                max_scale=cfg.DATA.TEST_CROP_SIZE,
                crop_size=cfg.DATA.TEST_CROP_SIZE, rng=rng,
            )
        return {
            "frames": np.ascontiguousarray(
                np.clip(frames, 0, 255).astype(np.uint8)
            ),
            "label": self._labels[index],
            "index": index,
            "time": 0.0,
            "pm": False,
        }


# PyTorchVideo-wrapper dataset names (`ptv_datasets.py:311,454`) alias the
# native implementations — same data, same protocol, native decode path.
DATASET_REGISTRY.register(Ssv2, name="Ptvssv2")
DATASET_REGISTRY.register(Charades, name="Ptvcharades")
