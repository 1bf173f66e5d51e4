#!/bin/bash
# MViT-tree single-run launcher (port of `exc_slowfast.sh`): one invocation,
# TensorBoard on, PMV subset off. No build step — the TPU package is
# pure-python + a prebuilt native decoder.
set -x
chmod +x "${EXP_EXCUATION_SCRIPT}"

./"${EXP_EXCUATION_SCRIPT}" \
  DATA.PM_SUBSET "''" \
  TENSORBOARD.ENABLE True \
  DATA.LABEL_PATH_TEMPLATE "{}{}.csv" "${@}"
