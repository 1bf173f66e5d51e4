"""Dry-run of tools/validate_zoo.py: a reference-code-generated .pyth
checkpoint flows through the importer + multi-view test to a JSON verdict.

With released weights unavailable (no egress), this pins the full
weights-drop-day path end to end: .pyth file -> torch importer ->
multi-view TestMeter -> top-1 diff. Accuracy itself is meaningless here
(random weights, synthetic videos); the tool's --expected-top1 gate is
exercised both ways.
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))

from ref_loader import import_reference_models  # noqa: E402

T, S = 4, 32


@pytest.fixture
def zoo_setup(tmp_path):
    from pmv_tpu.native import binding

    vids = tmp_path / "videos"
    vids.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        frames = rng.integers(0, 255, (40, 48, 48, 3), dtype=np.uint8)
        name = f"v{i}.avi"
        binding.write_test_video(vids / name, frames, fps=30)
        rows.append(f"{name},{i % 2}")
    (tmp_path / "test_pmv400.csv").write_text("\n".join(rows) + "\n")

    yaml_path = tmp_path / "TINY_MVITV2.yaml"
    yaml_path.write_text(
        f"""
MODEL:
  MODEL_NAME: MViT
  ARCH: mvit
  NUM_CLASSES: 11
  DROPOUT_RATE: 0.0
MVIT:
  DEPTH: 3
  EMBED_DIM: 8
  NUM_HEADS: 1
  DIM_MUL: [[1, 2.0]]
  HEAD_MUL: [[1, 2.0]]
  POOL_KVQ_KERNEL: [3, 3, 3]
  POOL_KV_STRIDE_ADAPTIVE: [1, 4, 4]
  POOL_Q_STRIDE: [[0, 1, 1, 1], [1, 1, 2, 2], [2, 1, 1, 1]]
  DROPPATH_RATE: 0.0
  MODE: conv
  CLS_EMBED_ON: False
  USE_ABS_POS: False
  REL_POS_SPATIAL: True
  REL_POS_TEMPORAL: True
  QKV_BIAS: True
  RESIDUAL_POOLING: True
  DIM_MUL_IN_ATT: True
DATA:
  PATH_TO_DATA_DIR: {tmp_path}
  PATH_PREFIX: {vids}
  PM_SUBSET: _pmv400
  PATH_LABEL_SEPARATOR: ","
  NUM_FRAMES: {T}
  SAMPLING_RATE: 2
  TRAIN_CROP_SIZE: {S}
  TEST_CROP_SIZE: {S}
TEST:
  ENABLE: True
  DATASET: kinetics
  BATCH_SIZE: 8
  NUM_ENSEMBLE_VIEWS: 2
  NUM_SPATIAL_CROPS: 1
OUTPUT_DIR: {tmp_path / "out"}
TPU:
  COMPUTE_DTYPE: float32
""".lstrip()
    )

    # reference-code-generated checkpoint in the released .pyth format
    from pmv_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(str(yaml_path))
    ref_models = import_reference_models("MViT")
    torch.manual_seed(0)
    m = ref_models.MViT(cfg)
    ckpt = tmp_path / "ckpt_epoch_00001.pyth"
    torch.save({"model_state": m.state_dict(), "epoch": 1}, str(ckpt))
    return yaml_path, ckpt


def test_validate_zoo_dryrun(zoo_setup, capsys):
    yaml_path, ckpt = zoo_setup
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import validate_zoo

    # no expectation for this config name -> plumbing-only verdict, rc 0
    rc = validate_zoo.run(
        validate_zoo.parse_args(
            ["--cfg", str(yaml_path), "--ckpt", str(ckpt)]
        )
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    verdict = json.loads(out)
    assert rc == 0
    assert 0.0 <= verdict["top1"] <= 100.0
    assert verdict["expected_top1"] is None

    # an absurd expectation must fail the gate
    rc = validate_zoo.run(
        validate_zoo.parse_args(
            [
                "--cfg", str(yaml_path), "--ckpt", str(ckpt),
                "--expected-top1", "99.9", "--tolerance", "0.3",
            ]
        )
    )
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and verdict["pass"] is False
    assert verdict["diff"] == round(verdict["top1"] - 99.9, 3)


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
