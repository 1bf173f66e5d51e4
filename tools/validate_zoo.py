"""Released-checkpoint accuracy validation: one command from a PyTorch
``.pyth`` file + val CSV to a multi-view top-1 diff against the reference
model zoo.

This is the harness for the "top-1 within 0.3% of the released
checkpoints" leg of the north star (`BASELINE.md`): the moment checkpoint
files are available (no egress here), run

    python tools/validate_zoo.py --cfg configs/Kinetics/MVITv2_S_16x4.yaml \
        --ckpt /path/K400_MVITv2_S_16x4.pyth \
        --opts DATA.PATH_TO_DATA_DIR /path/k400_lists DATA.PATH_PREFIX ...

and read the one-line JSON verdict. The checkpoint flows through the
torch importer (`pmv_tpu/utils/torch_import.py`: layout transposition,
2D->3D inflation, sub-BN renorm — parity-tested against the reference's
`checkpoint.py:191-563` semantics) into the standard multi-view test
(`pmv_tpu/engine/test.py`, protocol per the config's TEST section).

Expected top-1 comes from the built-in zoo table (MViT/MODEL_ZOO.md +
Uniformer/README.md numbers, keyed by config basename) or --expected-top1.
Exit code 0 iff |measured - expected| <= --tolerance (default 0.3).

Dry-runnable without released weights: tests/test_validate_zoo.py routes
a reference-code-generated .pyth through this exact entry on synthetic
data (the verdict then checks plumbing, not accuracy).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference-published accuracies (BASELINE.md sources; config basename ->
# (top1, protocol note)).
ZOO = {
    "MVITv2_S_16x4.yaml": (81.0, "5 clips x 1 crop @224, K400"),
    "MVITv2_B_32x3.yaml": (82.9, "5 clips x 1 crop @224, K400"),
    "MVIT_B_16x4_CONV.yaml": (78.4, "5 clips x 1 crop @224, K400"),
    "MVIT_B_32x3_CONV.yaml": (80.4, "5 clips x 1 crop @224, K400"),
    "UNIFORMER_S_16x4.yaml": (80.8, "4 clips x 1 crop @224, K400"),
    "UNIFORMER_S_8x8_K400_exp.yaml": (78.4, "4 clips x 1 crop, K400"),
    "UNIFORMER_B_16x4_K400_exp.yaml": (82.0, "4 clips x 1 crop, K400"),
    "X3D_M.yaml": (75.1, "10 views @256, K400"),
    "X3D_XS.yaml": (68.7, "10 views, K400"),
    "X3D_S.yaml": (73.1, "10 views, K400"),
    "X3D_L.yaml": (76.9, "10 views, K400"),
    "SLOWFAST_8x8_R50.yaml": (77.0, "10 clips x 3 crops, K400"),
    "SLOWFAST_4x16_R50.yaml": (75.6, "10 clips x 3 crops, K400"),
    "I3D_8x8_R50.yaml": (73.5, "10 clips x 3 crops, K400"),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--ckpt", required=True, help=".pyth/.pth checkpoint")
    p.add_argument(
        "--expected-top1", type=float, default=None,
        help="override the built-in zoo expectation",
    )
    p.add_argument("--tolerance", type=float, default=0.3)
    p.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="config overrides: KEY VALUE pairs after --opts",
    )
    args = p.parse_args(argv)
    if args.opts and args.opts[0] == "--opts":
        args.opts = args.opts[1:]
    return args


def run(args):
    from pmv_tpu.config import get_cfg
    from pmv_tpu.config.defaults import assert_and_infer_cfg
    from pmv_tpu.engine.test import test

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = True
    cfg.TEST.CHECKPOINT_FILE_PATH = args.ckpt
    if args.ckpt.endswith((".pyth", ".pth", ".pt")):
        cfg.TEST.CHECKPOINT_TYPE = "pytorch"
    cfg = assert_and_infer_cfg(cfg)

    stats = test(cfg)
    if isinstance(stats, list):  # dense-crop sweep returns per-ratio stats
        stats = max(
            stats, key=lambda s: float(s.get("top1_acc", float("-inf")))
        )
    if "top1_acc" not in stats:
        raise SystemExit(
            "validate_zoo expects classification stats with 'top1_acc'; "
            f"got keys {sorted(stats)} — multi-label/detection configs "
            "report mAP and are not supported by this harness."
        )
    top1 = float(stats["top1_acc"])

    name = os.path.basename(args.cfg_file)
    expected, protocol = ZOO.get(name, (None, None))
    if args.expected_top1 is not None:
        expected = args.expected_top1
    verdict = {
        "config": name,
        "ckpt": args.ckpt,
        "top1": top1,
        "top5": float(stats.get("top5_acc", "nan")),
        "expected_top1": expected,
        "protocol": protocol,
    }
    if expected is not None:
        verdict["diff"] = round(top1 - expected, 3)
        verdict["pass"] = abs(top1 - expected) <= args.tolerance
    print(json.dumps(verdict))
    return 0 if verdict.get("pass", True) else 1


def main():
    sys.exit(run(parse_args()))


if __name__ == "__main__":
    main()
