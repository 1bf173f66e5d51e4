"""Kinetics / PMV-400 dataset.

Host-side re-design of `MViT/slowfast/datasets/kinetics.py:30-603`:

- CSV split list via `DATA.LABEL_PATH_TEMPLATE.format(mode, PM_SUBSET)`
  with `DATA.PATH_LABEL_SEPARATOR` (`kinetics.py:110-112,134-160`).
- test mode unrolls each video into NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS
  deterministic views (`kinetics.py:86-91,229-250`).
- 100-retry decode loop with random replacement during training
  (`kinetics.py:281-308`).
- PMV rect crops with auto landscape/portrait switching + per-sample `pm`
  flag; portrait crops are transposed to the landscape layout
  (`kinetics.py:465-503`).
- DUMMY_LOAD synthetic-batch mode (`kinetics.py:81,529-531`).

TPU-first split of responsibilities: the host stops at fixed-shape uint8
crops (decode -> short-side scale [in swscale] -> crop -> flip); RandAugment,
normalization, erasing and mixup run on-device inside the jitted step
(engine/steps.py). Output layout is channels-last [T, H, W, C] uint8.
"""

import math
import os
import random

import numpy as np

from pmv_tpu.data import spatial, transform
from pmv_tpu.data import video_decoder
from pmv_tpu.data.build import DATASET_REGISTRY
from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)


@DATASET_REGISTRY.register(name="Kinetics")
class Kinetics:
    _NUM_RETRIES = 100

    def __init__(self, cfg, mode):
        assert mode in ["train", "val", "test"]
        self.cfg = cfg
        self.mode = mode
        self.p_convert_gray = cfg.DATA.COLOR_RND_GRAYSCALE

        if mode in ["train", "val"]:
            self._num_clips = 1
        else:
            self._num_clips = (
                cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
            )
        self.dummy_output = None
        self._construct_loader()

    def _construct_loader(self):
        cfg = self.cfg
        csv_name = cfg.DATA.LABEL_PATH_TEMPLATE.format(
            self.mode, cfg.DATA.PM_SUBSET
        )
        path_to_file = os.path.join(cfg.DATA.PATH_TO_DATA_DIR, csv_name)
        assert os.path.exists(path_to_file), f"{path_to_file} not found"
        self._path_to_videos = []
        self._labels = []
        self._spatial_temporal_idx = []
        # Chunked CSV loading (`kinetics.py:76-80,126-128,167-179`): train
        # mode reads only LOADER_CHUNK_SIZE rows starting at DATA.SKIP_ROWS
        # (the engine advances SKIP_ROWS and rebuilds the loader each epoch,
        # `train_net.py:675-686`), so giant split files never sit in RAM.
        self.skip_rows = cfg.DATA.SKIP_ROWS
        self.use_chunk_loading = (
            self.mode == "train" and cfg.DATA.LOADER_CHUNK_SIZE > 0
        )
        with open(path_to_file, "r") as f:
            if self.use_chunk_loading:
                rows = self._get_chunk(f, cfg.DATA.LOADER_CHUNK_SIZE)
            else:
                rows = (line for line in f)
            for clip_idx, line in enumerate(rows):
                line = line.strip()
                if not line:
                    continue
                parts = line.split(cfg.DATA.PATH_LABEL_SEPARATOR)
                # 2 fields = path,label; 3 = path,fn,label; 1 = path only
                # (`kinetics.py:130-145`).
                if len(parts) == 2:
                    path, label = parts
                elif len(parts) == 3:
                    path, _, label = parts
                elif len(parts) == 1:
                    path, label = parts[0], 0
                else:
                    raise RuntimeError(f"bad row: {line}")
                for idx in range(self._num_clips):
                    self._path_to_videos.append(
                        os.path.join(cfg.DATA.PATH_PREFIX, path)
                    )
                    self._labels.append(int(label))
                    self._spatial_temporal_idx.append(idx)
        assert len(self._path_to_videos) > 0, f"empty split {path_to_file}"
        logger.info(
            "Constructed kinetics dataset (size %d) from %s",
            len(self._path_to_videos), path_to_file,
        )

    def _get_chunk(self, f, chunksize):
        """First ``chunksize`` rows after ``self.skip_rows`` (stdlib stand-in
        for the reference's pandas chunked read, `kinetics.py:167-179`);
        wraps to the file start when the skip runs past EOF."""
        for attempt in range(2):
            rows = []
            for i, line in enumerate(f):
                if i < self.skip_rows:
                    continue
                rows.append(line)
                if len(rows) >= chunksize:
                    break
            if rows:
                return rows
            # Wrap once to the file start; a second empty pass means the
            # split file itself has no rows — fail loudly, don't recurse.
            self.skip_rows = 0
            f.seek(0)
        raise RuntimeError(
            f"{getattr(f, 'name', '<split file>')} yielded no rows "
            "(empty split file?)"
        )

    def _set_epoch_num(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def num_videos(self):
        return len(self._path_to_videos)

    def _sample_params(self, index, short_cycle_idx=None):
        """(temporal_idx, spatial_idx, min_scale, max_scale, crop_size)."""
        cfg = self.cfg
        if self.mode in ["train", "val"]:
            temporal_idx = -1
            # -1 = random; the reference honors TRAIN.SPATIAL_SAMPLE_INDEX
            # in train/val mode (`kinetics.py:208`) for deterministic
            # spatial positioning experiments.
            spatial_idx = cfg.TRAIN.SPATIAL_SAMPLE_INDEX
            min_scale = cfg.DATA.TRAIN_JITTER_SCALES[0]
            max_scale = cfg.DATA.TRAIN_JITTER_SCALES[1]
            crop_size = cfg.DATA.TRAIN_CROP_SIZE
            if short_cycle_idx in [0, 1] and cfg.MULTIGRID.SHORT_CYCLE:
                # Short-cycle crop scaling (`kinetics.py` short_cycle_idx +
                # `multigrid_helper.py` ShortCycleBatchSampler).
                crop_size = int(
                    round(
                        cfg.MULTIGRID.SHORT_CYCLE_FACTORS[short_cycle_idx]
                        * cfg.MULTIGRID.DEFAULT_S
                    )
                )
            if cfg.MULTIGRID.DEFAULT_S > 0:
                # Decreasing the scale with the crop keeps relative zoom.
                min_scale = int(
                    round(float(min_scale) * crop_size / cfg.MULTIGRID.DEFAULT_S)
                )
        else:
            st_idx = self._spatial_temporal_idx[index]
            temporal_idx = st_idx // cfg.TEST.NUM_SPATIAL_CROPS
            spatial_idx = (
                st_idx % cfg.TEST.NUM_SPATIAL_CROPS
                if cfg.TEST.NUM_SPATIAL_CROPS > 1
                else (
                    cfg.TEST.SPATIAL_SAMPLE_INDEX
                    if cfg.TEST.SPATIAL_SAMPLE_INDEX in (-2, 0, 1, 2)
                    else 1
                )
            )
            # Multi-crop protocols resize the short side to the crop size;
            # the 1-crop protocol resizes to TRAIN_JITTER_SCALES[0] and
            # center-crops from the larger frame (`kinetics.py:244-250`) —
            # the MViT PMV recipe (5 clips x 1 crop) takes this branch.
            min_scale, max_scale = (
                [cfg.DATA.TEST_CROP_SIZE] * 2
                if cfg.TEST.NUM_SPATIAL_CROPS > 1
                else [cfg.DATA.TRAIN_JITTER_SCALES[0]] * 2
            )
            crop_size = cfg.DATA.TEST_CROP_SIZE
        return temporal_idx, spatial_idx, min_scale, max_scale, crop_size

    def __getitem__(self, index):
        cfg = self.cfg
        short_cycle_idx = None
        if isinstance(index, tuple):  # (index, short_cycle_idx) from loader
            index, short_cycle_idx = index
        if cfg.DATA.DUMMY_LOAD and self.dummy_output is not None:
            return self.dummy_output

        (
            temporal_idx, spatial_idx, min_scale, max_scale, crop_size
        ) = self._sample_params(index, short_cycle_idx)
        rng = np.random.default_rng()

        from pmv_tpu.native import binding

        for i_try in range(self._NUM_RETRIES):
            path = self._path_to_videos[index]
            try:
                reader = binding.VideoReader(path)
            except Exception as e:
                logger.warning("Failed to open %s: %s", path, e)
                reader = None
            if reader is None:
                if self.mode not in ["test"] and i_try > self._NUM_RETRIES // 8:
                    index = random.randint(0, len(self._path_to_videos) - 1)
                continue
            try:
                frames, time_frac = self._decode_and_transform(
                    reader, temporal_idx, spatial_idx,
                    min_scale, max_scale, crop_size, rng,
                )
            except Exception as e:
                logger.warning("Failed to decode %s: %s", path, e)
                frames = None
            finally:
                reader.close()
            if frames is None:
                if self.mode not in ["test"] and i_try > self._NUM_RETRIES // 8:
                    index = random.randint(0, len(self._path_to_videos) - 1)
                continue
            frames, pm = frames
            label = self._labels[index]
            sample = {
                "frames": frames,  # uint8 [T, H, W, C]
                "label": label,
                "index": index,
                "time": time_frac,
                "pm": pm,
            }
            if self.mode == "train" and cfg.AUG.GEN_MASK_LOADER:
                # Blockwise MaskFeat mask on the token window
                # (`kinetics.py:542-578` _gen_mask).
                from pmv_tpu.data.masking import gen_mask

                sample["mask"] = gen_mask(cfg, rng).reshape(-1).astype(bool)
            if cfg.DATA.DUMMY_LOAD and self.dummy_output is None:
                self.dummy_output = sample
            return sample
        raise RuntimeError(
            f"Failed to fetch video after {self._NUM_RETRIES} retries."
        )

    def _decode_and_transform(
        self, reader, temporal_idx, spatial_idx, min_scale, max_scale,
        crop_size, rng,
    ):
        cfg = self.cfg

        # ---- geometry decisions before decode (lets swscale do the resize)
        H, W = reader.height, reader.width
        is_test = self.mode == "test"
        switch_auto = (
            cfg.DATA.TEST_CROP_SIZE_RECT_SWITCH_AUTO
            if is_test
            else cfg.DATA.TRAIN_CROP_SIZE_RECT_SWITCH_AUTO
        )
        rect = (
            cfg.DATA.TEST_CROP_SIZE_RECT if is_test
            else cfg.DATA.TRAIN_CROP_SIZE_RECT
        )
        rect = list(rect) if len(rect) else None
        pm = False
        if rect is not None and switch_auto:
            if H > W:
                rect = rect[::-1]
                pm = True
        auto_adjust = (
            cfg.DATA.TEST_JITTER_SCALES_AUTO_ADJUST if is_test
            else cfg.DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST
        )

        scl = list(cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE)
        asp = list(cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE)
        use_relative = self.mode == "train" and len(scl) and len(asp)

        # Short-side target for the in-decoder resize. For the Inception-
        # style relative crop the box is sampled on the decoded frame, so
        # decode at the jitter scale too (area stats are scale-invariant).
        if spatial_idx == -1:
            if rect is not None and auto_adjust:
                min_scale, max_scale = spatial.scale_adjust_short_side_scale_jitter(
                    min_scale, max_scale, rect, H, W
                )
            size = int(round(rng.uniform(min_scale, max_scale)))
        else:
            if rect is not None and auto_adjust:
                min_scale, max_scale = spatial.scale_adjust_short_side_scale_jitter(
                    min_scale, max_scale, rect, H, W
                )
                max_scale = min_scale
            size = min_scale
        out_h, out_w = video_decoder.jitter_scale_dims(H, W, size)

        # Contrastive multi-clip positives: V temporal windows per sample
        # (`kinetics.py:258-276`, DATA.TRAIN_CROP_NUM_TEMPORAL).
        num_temporal = (
            cfg.DATA.TRAIN_CROP_NUM_TEMPORAL if self.mode == "train" else 1
        )
        # Multigrid long cycles raise the sampling rate randomly so short
        # clips can cover the original span (`utils.py:394-403`); fps jitter
        # perturbs the resampling target (`kinetics.py:349-351`).
        sampling_rate = cfg.DATA.SAMPLING_RATE
        if (
            self.mode == "train"
            and cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE > sampling_rate
        ):
            sampling_rate = int(
                rng.integers(
                    sampling_rate, cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE + 1
                )
            )
        target_fps = cfg.DATA.TARGET_FPS
        if self.mode == "train" and cfg.DATA.TRAIN_JITTER_FPS > 0.0:
            target_fps += float(rng.uniform(0.0, cfg.DATA.TRAIN_JITTER_FPS))
        if num_temporal > 1:
            frames, fracs = video_decoder.decode_multi_clip(
                reader,
                sampling_rate,
                cfg.DATA.NUM_FRAMES,
                num_views=num_temporal,
                min_delta=cfg.CONTRASTIVE.DELTA_CLIPS_MIN,
                max_delta=cfg.CONTRASTIVE.DELTA_CLIPS_MAX,
                target_fps=target_fps,
                use_offset=cfg.DATA.USE_OFFSET_SAMPLING,
                out_w=out_w,
                out_h=out_h,
                rng=rng,
            )
            time_frac = float(fracs[0])
        else:
            frames, time_frac = video_decoder.decode_clip(
                reader,
                sampling_rate,
                cfg.DATA.NUM_FRAMES,
                clip_idx=temporal_idx,
                num_clips=(
                    cfg.TEST.NUM_ENSEMBLE_VIEWS if is_test else 1
                ),
                target_fps=target_fps,
                use_offset=cfg.DATA.USE_OFFSET_SAMPLING,
                out_w=out_w,
                out_h=out_h,
                rng=rng,
            )
        frames = frames.astype(np.float32)

        # ---- crop / flip (host, cheap) -------------------------------------
        if spatial_idx == -1:
            def one_crop(fr):
                if use_relative:
                    th, tw = (
                        (crop_size, crop_size) if rect is None
                        else (rect[0], rect[1])
                    )
                    fr = transform.random_resized_crop(
                        fr, th, tw, scale=tuple(scl), ratio=tuple(asp),
                        switch_hw=True, rng=rng,
                    )
                else:
                    if rect is None:
                        fr = transform.random_crop(fr, crop_size, rng=rng)
                    else:
                        fr = transform.random_crop_rect(fr, rect, rng=rng)
                if cfg.DATA.RANDOM_FLIP:
                    fr = transform.horizontal_flip(0.5, fr, rng=rng)
                return fr

            num_spatial = (
                cfg.DATA.TRAIN_CROP_NUM_SPATIAL if self.mode == "train" else 1
            )
            if num_temporal > 1 or num_spatial > 1:
                # Contrastive views: independent spatial crops of each
                # temporal clip, stacked on a leading view axis
                # (`kinetics.py:396-401`).
                clips = frames if num_temporal > 1 else [frames]
                frames = np.stack(
                    [
                        one_crop(cl)
                        for cl in clips
                        for _ in range(num_spatial)
                    ]
                )
            else:
                # Repeated augmentation (`kinetics.py:396-401`,
                # AUG.NUM_SAMPLE): decode once, crop/flip NUM_SAMPLE times.
                # Each copy re-samples its RandomResizedCrop box and flip
                # here (one_crop), so per-copy crop GEOMETRY is re-jittered
                # exactly like the reference's per-copy spatial_sampling;
                # only the decode-time short-side resize is shared, and the
                # relative box distribution is decode-scale-invariant to
                # within integer rounding (KS <= 0.026 at the harshest
                # scale, measured — tests/test_aug_equivalence.py). The
                # residual deviation is one extra bilinear resample per
                # copy, not an augmentation-distribution change. (Recipes
                # with AUG.ENABLE but empty TRAIN_JITTER_SCALES_RELATIVE
                # would share the short-side draw across copies; no
                # reference recipe uses that combination.)
                num_aug = (
                    cfg.AUG.NUM_SAMPLE
                    if self.mode == "train" and cfg.AUG.ENABLE
                    else 1
                )
                if num_aug > 1:
                    frames = np.stack(
                        [one_crop(frames) for _ in range(num_aug)]
                    )
                else:
                    frames = one_crop(frames)
        elif spatial_idx == -2:
            ratio = list(
                cfg.TEST.SPATIAL_SAMPLE_RATIO if is_test
                else cfg.TRAIN.SPATIAL_SAMPLE_RATIO
            )
            new_h, new_w = frames.shape[1], frames.shape[2]
            off_h = min(max(math.ceil((new_h - crop_size) * ratio[0]), 0),
                        new_h - crop_size)
            off_w = min(max(math.ceil((new_w - crop_size) * ratio[1]), 0),
                        new_w - crop_size)
            frames = transform.specified_crop(
                frames, crop_size, center_ords=[off_w, off_h]
            )
        else:
            if rect is None:
                frames = transform.uniform_crop(frames, crop_size, spatial_idx)
            else:
                frames = transform.uniform_crop_rect(frames, rect, spatial_idx)

        # Portrait -> landscape layout + pm flag (`kinetics.py:495-503`).
        # (axes from the end: frames may carry a leading num_aug axis)
        if pm:
            frames = np.swapaxes(frames, -3, -2)

        frames = np.ascontiguousarray(
            np.clip(frames, 0, 255).astype(np.uint8)
        )
        return (frames, pm), time_frac


# The reference also exposes a PyTorchVideo-backed loader for the same data
# under DATA.DATASET "ptvkinetics" (`MViT/slowfast/datasets/ptv_datasets.py:142`);
# here the native loader *is* the fast path, so the name aliases to it.
DATASET_REGISTRY.register(Kinetics, name="Ptvkinetics")
