#!/bin/bash
# Train-then-multi-view-test sequencing (port of `exc_uniformer.sh`):
# runs ${EXP_EXCUATION_SCRIPT} once to train, then again with
# TRAIN.ENABLE False + 4-view ensemble testing. No build step — the TPU
# package is pure-python + a prebuilt native decoder.
set -x
chmod +x "${EXP_EXCUATION_SCRIPT}"

./"${EXP_EXCUATION_SCRIPT}" \
  DATA.PM_SUBSET "''" \
  DATA.LABEL_PATH_TEMPLATE "{}{}.csv" "${@}"

./"${EXP_EXCUATION_SCRIPT}" \
  TRAIN.ENABLE False \
  DATA.PM_SUBSET "''" \
  DATA.LABEL_PATH_TEMPLATE "{}{}.csv" \
  DATA.TRAIN_JITTER_SCALES [224,224] \
  DATA.TEST_CROP_SIZE 224 \
  TEST.NUM_ENSEMBLE_VIEWS 4 \
  DATA_LOADER.NUM_WORKERS 5 \
  TEST.PROCESS True \
  TEST.NUM_SPATIAL_CROPS 1 "${@}"
