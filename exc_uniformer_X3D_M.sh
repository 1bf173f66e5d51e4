#!/bin/bash
# X3D-M train-then-test sequencing (port of `exc_uniformer_X3D_M.sh`):
# second invocation tests with 256-crop 3-spatial-crop ensemble.
set -x
chmod +x "${EXP_EXCUATION_SCRIPT}"

./"${EXP_EXCUATION_SCRIPT}" \
  DATA.PM_SUBSET "''" \
  DATA.LABEL_PATH_TEMPLATE "{}{}.csv" "${@}"

./"${EXP_EXCUATION_SCRIPT}" \
  TRAIN.ENABLE False \
  DATA.PM_SUBSET "''" \
  DATA.LABEL_PATH_TEMPLATE "{}{}.csv" \
  DATA.TEST_CROP_SIZE 256 \
  TEST.PROCESS True \
  TEST.NUM_SPATIAL_CROPS 3 "${@}"
