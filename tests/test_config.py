import math

import pytest

from pmv_tpu.config import assert_and_infer_cfg, get_cfg
from pmv_tpu.config.parser import load_config, parse_args


def test_defaults_tree():
    cfg = get_cfg()
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.DATA.TRAIN_CROP_SIZE_RECT == []
    assert cfg.MVIT.PATCH_STRIDE == [2, 4, 4]
    assert cfg.UNIFORMER.EMBED_DIM == [64, 128, 320, 512]


def test_merge_from_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(
        [
            "DATA.TRAIN_CROP_SIZE_RECT", "[256,192]",
            "SOLVER.BASE_LR", "1e-4",
            "TRAIN.BATCH_SIZE", "32",
            "DATA.PM_SUBSET", "_pmv400",
            "DATA.PATH_LABEL_SEPARATOR", ",",
            "MIXUP.ENABLE", "True",
        ]
    )
    assert cfg.DATA.TRAIN_CROP_SIZE_RECT == [256, 192]
    assert cfg.SOLVER.BASE_LR == 1e-4
    assert cfg.TRAIN.BATCH_SIZE == 32
    assert cfg.DATA.PM_SUBSET == "_pmv400"
    assert cfg.DATA.PATH_LABEL_SEPARATOR == ","
    assert cfg.MIXUP.ENABLE is True


def test_merge_rejects_unknown_key():
    cfg = get_cfg()
    with pytest.raises(AssertionError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_lr_scaling_by_shards():
    cfg = get_cfg()
    cfg.NUM_SHARDS = 4
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_START_LR = 1e-6
    cfg.SOLVER.BASE_LR_SCALE_NUM_SHARDS = True
    cfg = assert_and_infer_cfg(cfg)
    assert cfg.SOLVER.BASE_LR == pytest.approx(4e-4)
    assert cfg.SOLVER.WARMUP_START_LR == pytest.approx(4e-6)

    cfg2 = get_cfg()
    cfg2.NUM_SHARDS = 4
    cfg2.SOLVER.BASE_LR = 1e-4
    cfg2.SOLVER.BASE_LR_SCALE_NUM_SHARDS = False
    cfg2 = assert_and_infer_cfg(cfg2)
    # No scaling unless requested (`defaults.py:1344-1352`).
    assert cfg2.SOLVER.BASE_LR == pytest.approx(1e-4)


def test_parser_surface():
    args = parse_args(
        [
            "--cfg", "nonexistent.yaml",
            "--num_shards", "2",
            "--shard_id", "1",
            "--init_method", "tcp://host:28999",
            "--opts", "DATA.PM_SUBSET", "_pmv400",
        ]
    )
    assert args.num_shards == 2
    assert args.shard_id == 1
    cfg = load_config(args)
    assert cfg.NUM_SHARDS == 2
    assert cfg.SHARD_ID == 1
    assert cfg.TPU.COORDINATOR_ADDRESS == "host:28999"
    assert cfg.DATA.PM_SUBSET == "_pmv400"


def test_yaml_merge(tmp_path):
    yaml_file = tmp_path / "cfg.yaml"
    yaml_file.write_text(
        "MVIT:\n  DEPTH: 16\n  DIM_MUL: [[1, 2.0], [3, 2.0], [14, 2.0]]\n"
        "SOLVER:\n  BASE_LR: 0.0001\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(yaml_file))
    assert cfg.MVIT.DEPTH == 16
    assert cfg.MVIT.DIM_MUL == [[1, 2.0], [3, 2.0], [14, 2.0]]
    assert cfg.SOLVER.BASE_LR == 0.0001


def test_lr_scaling_by_num_shards_reference_semantics():
    """Scaling applies only when BASE_LR_SCALE_NUM_SHARDS is set; sqrt via
    BASE_LR_SCALE_NUM_SHARDS_BY_SQRT (`defaults.py:1344-1352`)."""
    import math

    from pmv_tpu.config import assert_and_infer_cfg, get_cfg

    cfg = get_cfg()
    cfg.NUM_SHARDS = 4
    base = cfg.SOLVER.BASE_LR
    cfg2 = assert_and_infer_cfg(cfg.clone())
    assert cfg2.SOLVER.BASE_LR == base  # no flag -> no scaling

    cfg.SOLVER.BASE_LR_SCALE_NUM_SHARDS = True
    cfg3 = assert_and_infer_cfg(cfg.clone())
    assert abs(cfg3.SOLVER.BASE_LR - base * 4) < 1e-9

    cfg.SOLVER.BASE_LR_SCALE_NUM_SHARDS_BY_SQRT = True
    cfg4 = assert_and_infer_cfg(cfg.clone())
    assert abs(cfg4.SOLVER.BASE_LR - base * math.sqrt(4)) < 1e-9


def test_all_shipped_yamls_parse():
    """Every configs/**/*.yaml merges cleanly and passes validation."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    paths = glob.glob(os.path.join(root, "configs", "**", "*.yaml"),
                      recursive=True)
    assert paths
    for p in paths:
        cfg = get_cfg()
        cfg.merge_from_file(p)
        assert_and_infer_cfg(cfg)
