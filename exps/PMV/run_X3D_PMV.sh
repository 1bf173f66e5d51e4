#!/bin/bash
# X3D-M PMV-400 recipes (port of exps/PMV/run_X3D_PMV.sh): bs 64, SGD LR
# 0.05, 300 epochs.
set -e
PROJ_DIR=${PROJ_DIR:-"YOU_PROJECT_DIR"}
cd "$(dirname "$0")/../.."

COMMON_OPTS=(
  DATA_LOADER.NUM_WORKERS 10
  DATA.DECODING_BACKEND ffmpeg
  DATA.TRAIN_CROP_SIZE 224
  SOLVER.MAX_EPOCH 300
  TRAIN.BATCH_SIZE 64
  SOLVER.BASE_LR 0.05
  SOLVER.BASE_LR_SCALE_NUM_SHARDS True
  DATA.PM_SUBSET _pmv400
  DATA.PATH_TO_DATA_DIR ./data_list/PMV
  DATA.PATH_LABEL_SEPARATOR ","
  DATA.PATH_PREFIX ${PROJ_DIR}/PMV_dataset/
  MODEL.NUM_CLASSES 400
)

run() {
  OUTPUT_DIR=$1; shift
  python tools/run_net.py \
    --cfg configs/Kinetics/X3D_M.yaml \
    --opts "${COMMON_OPTS[@]}" OUTPUT_DIR "$OUTPUT_DIR" "$@"
}

# default recipe
run ${PROJ_DIR}/x3d_m_pmv/default_224

# random-scale recipe
run ${PROJ_DIR}/x3d_m_pmv/random_scale_224 \
  DATA.TRAIN_JITTER_SCALES_RELATIVE [0.08,1.0] \
  DATA.TRAIN_JITTER_ASPECT_RELATIVE [0.75,1.3333]

# rect 256x192
run ${PROJ_DIR}/x3d_m_pmv/rect_256_192 \
  DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST True DATA.TRAIN_CROP_SIZE_RECT [256,192]

# rect 288x192
run ${PROJ_DIR}/x3d_m_pmv/rect_288_192 \
  DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST True DATA.TRAIN_CROP_SIZE_RECT [288,192]
