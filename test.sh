#!/bin/bash
# Smoke entry (the reference ships `MViT/test.sh` / `Uniformer/test.sh`
# tiny-config runs): one epoch of training + a multi-view test on synthetic
# data, CPU or a single chip. Pass extra `KEY VALUE` overrides after `--`.
set -e
cd "$(dirname "$0")"
exec python tools/run_net.py --cfg configs/tiny_synthetic.yaml "$@"
