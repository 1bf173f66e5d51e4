#!/usr/bin/env python3
"""Train/test/demo dispatch (`MViT/tools/run_net.py:15-49`).

Usage mirrors the reference so `exps/PMV` scripts port unchanged:
    python tools/run_net.py --cfg cfg.yaml [--num_shards N --shard_id I
        --init_method tcp://host:port] [KEY VALUE ...]
Runs train then test per TRAIN.ENABLE / TEST.ENABLE, with the multi-view
sweep when TEST.NUM_ENSEMBLE_VIEWS == -1.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Honor JAX_PLATFORMS authoritatively: some PJRT plugins (the tunneled
# axon TPU backend among them) override env-based platform selection, so a
# CPU-pinned child process (tests/test_multiprocess_e2e.py) could silently
# grab the real chip. jax.config wins over plugin auto-selection.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pmv_tpu.config.defaults import assert_and_infer_cfg
from pmv_tpu.config.parser import load_config, parse_args
from pmv_tpu.parallel.mesh import init_distributed


def main():
    args = parse_args()
    if args.cfg_files is None:
        return
    for path_to_config in args.cfg_files:
        cfg = load_config(args, path_to_config)
        cfg = assert_and_infer_cfg(cfg)
        init_distributed(cfg)

        if cfg.TRAIN.ENABLE:
            if cfg.MODEL.MODEL_NAME in ("ContrastiveModel", "MaskMViT"):
                from pmv_tpu.engine.ssl_train import train_ssl

                train_ssl(cfg)
            else:
                from pmv_tpu.engine.train import train

                train(cfg)

        if cfg.TEST.ENABLE:
            from pmv_tpu.engine.test import test

            if cfg.TEST.NUM_ENSEMBLE_VIEWS == -1:
                # Multi-view sweep (`run_net.py:30-41`).
                num_view_list = [1, 3, 5, 7, 10]
                for num_view in num_view_list:
                    sweep = cfg.clone()
                    sweep.TEST.NUM_ENSEMBLE_VIEWS = num_view
                    test(sweep)
            elif len(cfg.TEST.NUM_TEMPORAL_CLIPS) > 0:
                # Per-protocol clip sweep (`test_net.py:400-401`).
                for num_view in cfg.TEST.NUM_TEMPORAL_CLIPS:
                    sweep = cfg.clone()
                    sweep.TEST.NUM_TEMPORAL_CLIPS = []
                    sweep.TEST.NUM_ENSEMBLE_VIEWS = num_view
                    test(sweep)
            else:
                test(cfg)

        # Model visualization (`run_net.py:41-46` dispatch).
        if cfg.TENSORBOARD.ENABLE and (
            cfg.TENSORBOARD.MODEL_VIS.ENABLE
            or cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE
        ):
            from tools.visualization import visualize

            visualize(cfg)

        if cfg.DEMO.ENABLE:
            # Detection configs with precomputed boxes route to the AVA
            # visualizer (`demo_net.py:96-105` dispatch).
            if cfg.DETECTION.ENABLE and cfg.DEMO.PREDS_BOXES:
                from pmv_tpu.visualization.ava_demo import ava_demo

                ava_demo(cfg)
            else:
                from pmv_tpu.visualization.demo import demo

                demo(cfg)


if __name__ == "__main__":
    main()
