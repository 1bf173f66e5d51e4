"""Loader + dataset tests (synthetic and real-video CSV paths)."""

import os

import numpy as np
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.data.build import build_dataset
from pmv_tpu.data.loader import DataLoader, construct_loader
import pmv_tpu.data.synthetic  # noqa: F401  (register)
import pmv_tpu.data.kinetics  # noqa: F401  (register)


def test_synthetic_loader_shapes():
    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.MODEL.NUM_CLASSES = 10
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    loader = construct_loader(cfg, "train")
    batch = next(iter(loader))
    assert batch["frames"].shape == (4, 2, 16, 16, 3)
    assert batch["frames"].dtype == np.uint8
    assert batch["labels"].shape == (4,)
    assert batch["pm"].dtype == bool


def test_loader_epoch_reshuffle():
    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATA.NUM_FRAMES = 1
    cfg.DATA.TRAIN_CROP_SIZE = 8
    loader = construct_loader(cfg, "train")
    loader.set_epoch(0)
    b0 = next(iter(loader))["index"]
    loader.set_epoch(1)
    b1 = next(iter(loader))["index"]
    assert not np.array_equal(b0, b1)
    # Same epoch -> deterministic.
    loader.set_epoch(0)
    b0_again = next(iter(loader))["index"]
    np.testing.assert_array_equal(b0, b0_again)


def test_loader_sharding_disjoint():
    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.DATA.NUM_FRAMES = 1
    cfg.DATA.TRAIN_CROP_SIZE = 8
    ds = build_dataset("synthetic", cfg, "train")
    l0 = DataLoader(ds, 8, shuffle=True, drop_last=True, process_index=0, process_count=2)
    l1 = DataLoader(ds, 8, shuffle=True, drop_last=True, process_index=1, process_count=2)
    i0 = set(np.concatenate([b["index"] for b in l0]))
    i1 = set(np.concatenate([b["index"] for b in l1]))
    assert i0.isdisjoint(i1)
    assert len(i0) + len(i1) == len(ds)


@pytest.fixture
def pmv_csv_dataset(tmp_path):
    """A tiny on-disk PMV-style dataset: portrait + landscape videos + CSV."""
    from pmv_tpu.native import binding

    vids = tmp_path / "videos"
    vids.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i, (h, w) in enumerate([(128, 72), (72, 128), (128, 72), (96, 96)]):
        frames = rng.integers(0, 255, (40, h, w, 3), dtype=np.uint8)
        name = f"v{i}.avi"
        binding.write_test_video(vids / name, frames, fps=30)
        rows.append(f"{name},{i % 3}")
    csv = tmp_path / "train_pmv400.csv"
    csv.write_text("\n".join(rows) + "\n")
    (tmp_path / "test_pmv400.csv").write_text("\n".join(rows) + "\n")
    return tmp_path, vids


def test_kinetics_pmv_train(pmv_csv_dataset):
    root, vids = pmv_csv_dataset
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [80, 96]
    cfg.DATA.TRAIN_CROP_SIZE_RECT = [64, 48]
    cfg.DATA.TRAIN_CROP_SIZE_RECT_SWITCH_AUTO = True
    cfg.DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST = True
    ds = build_dataset("kinetics", cfg, "train")
    assert len(ds) == 4
    # SWITCH_AUTO yields a homogeneous batch shape: portrait videos (h>w)
    # take the reversed crop then a transpose back to the ori rect shape with
    # pm=True; landscape videos take the ori crop directly (pm=False)
    # (`kinetics.py:465-503`).
    s0 = ds[0]  # 128x72 portrait
    assert s0["frames"].shape == (4, 64, 48, 3)
    assert s0["pm"]
    s1 = ds[1]  # 72x128 landscape
    assert s1["frames"].shape == (4, 64, 48, 3)
    assert not s1["pm"]


def test_kinetics_pmv_test_multiview(pmv_csv_dataset):
    root, vids = pmv_csv_dataset
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 48
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    ds = build_dataset("kinetics", cfg, "test")
    assert len(ds) == 4 * 6
    views = [ds[i] for i in range(6)]  # all views of video 0
    for v in views:
        assert v["frames"].shape == (4, 48, 48, 3)
    # Deterministic: same view twice must be identical.
    again = ds[3]
    np.testing.assert_array_equal(views[3]["frames"], again["frames"])


def test_repeated_augmentation_collate():
    """AUG.NUM_SAMPLE > 1: decode-once multi-crop, copy-major flatten
    (`loader.py:46-71` multiple_samples_collate; `kinetics.py:396-401`)."""
    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.MODEL.NUM_CLASSES = 10
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.AUG.ENABLE = True
    cfg.AUG.NUM_SAMPLE = 2
    loader = construct_loader(cfg, "train")
    batch = next(iter(loader))
    # batch = videos x copies, flattened copy-major.
    assert batch["frames"].shape == (8, 2, 16, 16, 3)
    assert batch["labels"].shape == (8,)
    np.testing.assert_array_equal(batch["labels"][:4], batch["labels"][4:])
    np.testing.assert_array_equal(batch["index"][:4], batch["index"][4:])


def test_repeated_augmentation_kinetics_crops_differ(pmv_csv_dataset):
    root, vids = pmv_csv_dataset
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.AUG.ENABLE = True
    cfg.AUG.NUM_SAMPLE = 2
    ds = build_dataset("kinetics", cfg, "train")
    s = ds[0]
    assert s["frames"].shape[0] == 2  # leading copy axis
    assert s["frames"].shape[1] == 4
    # The two copies come from different random crops/flips.
    assert not np.array_equal(s["frames"][0], s["frames"][1])


def test_multiclip_decode(pmv_csv_dataset):
    from pmv_tpu.data.build import build_dataset

    root, vids = pmv_csv_dataset
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.DATA.TRAIN_CROP_NUM_TEMPORAL = 2
    cfg.DATA.TRAIN_CROP_NUM_SPATIAL = 2
    import pmv_tpu.data.kinetics  # noqa: F401

    ds = build_dataset("kinetics", cfg, "train")
    s = ds[0]
    # 2 temporal clips x 2 spatial crops.
    assert s["frames"].shape == (4, 4, 32, 32, 3)


def test_kinetics_fps_jitter_and_long_cycle_rate(pmv_csv_dataset):
    """TRAIN_JITTER_FPS + MULTIGRID.LONG_CYCLE_SAMPLING_RATE paths decode
    fine and keep the output geometry (`kinetics.py:316-352`)."""
    root, vids = pmv_csv_dataset
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [80, 96]
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TRAIN_JITTER_FPS = 8.0
    cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE = 4
    ds = build_dataset("kinetics", cfg, "train")
    s = ds[0]
    assert s["frames"].shape == (4, 64, 64, 3)


def test_kinetics_chunked_csv_loading(pmv_csv_dataset):
    """DATA.LOADER_CHUNK_SIZE: train mode reads only the chunk's rows
    starting at SKIP_ROWS and wraps past EOF (`kinetics.py:76-80,167-179`)."""
    root, vids = pmv_csv_dataset
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.LOADER_CHUNK_SIZE = 2
    cfg.DATA.LOADER_CHUNK_OVERALL_SIZE = 4

    ds = build_dataset("kinetics", cfg, "train")
    assert len(ds) == 2
    assert ds._path_to_videos[0].endswith("v0.avi")

    cfg.DATA.SKIP_ROWS = 2
    ds2 = build_dataset("kinetics", cfg, "train")
    assert len(ds2) == 2
    assert ds2._path_to_videos[0].endswith("v2.avi")

    # Past EOF: wraps back to the file start.
    cfg.DATA.SKIP_ROWS = 99
    ds3 = build_dataset("kinetics", cfg, "train")
    assert ds3._path_to_videos[0].endswith("v0.avi")

    # val/test modes ignore chunking.
    cfg.DATA.SKIP_ROWS = 0
    ds_test = build_dataset("kinetics", cfg, "test")
    assert len(ds_test) == 4 * cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS


def test_train_spatial_sample_index(pmv_csv_dataset):
    """TRAIN.SPATIAL_SAMPLE_INDEX pins the train crop position
    (`kinetics.py:208`): repeated loads give identical frames."""
    root, vids = pmv_csv_dataset
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [64, 64]
    cfg.DATA.TRAIN_CROP_SIZE = 48
    cfg.TRAIN.SPATIAL_SAMPLE_INDEX = 1
    ds = build_dataset("kinetics", cfg, "train")
    tidx, sidx, *_ = ds._sample_params(3)
    assert tidx == -1 and sidx == 1
    # Deterministic center crop path: the square 96x96 video scaled to 64
    # then uniform-cropped at idx 1 — same spatial window every sample.
    s = ds[3]
    assert s["frames"].shape == (4, 48, 48, 3)
    # default -1 keeps random sampling
    cfg.TRAIN.SPATIAL_SAMPLE_INDEX = -1
    ds_r = build_dataset("kinetics", cfg, "train")
    _, sidx_r, *_ = ds_r._sample_params(3)
    assert sidx_r == -1
