#!/usr/bin/env python3
"""Data-loading benchmark entry (`MViT/tools/benchmark.py`)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pmv_tpu.config.defaults import assert_and_infer_cfg
from pmv_tpu.config.parser import load_config, parse_args
from pmv_tpu.utils.benchmark import benchmark_data_loading


def main():
    args = parse_args()
    for path_to_config in args.cfg_files or [None]:
        cfg = load_config(args, path_to_config)
        cfg = assert_and_infer_cfg(cfg)
        benchmark_data_loading(cfg)


if __name__ == "__main__":
    main()
