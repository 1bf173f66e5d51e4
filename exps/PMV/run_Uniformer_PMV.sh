#!/bin/bash
# UniFormer-S 16x4 PMV-400 recipes (port of exps/PMV/run_Uniformer_PMV.sh):
# bs 96, LR 2e-4, 100 epochs, warmup 10, trained from scratch (no pretrain).
set -e
PROJ_DIR=${PROJ_DIR:-"YOU_PROJECT_DIR"}
cd "$(dirname "$0")/../.."

COMMON_OPTS=(
  DATA_LOADER.NUM_WORKERS 10
  DATA.DECODING_BACKEND ffmpeg
  DATA.TRAIN_CROP_SIZE 224
  SOLVER.MAX_EPOCH 100
  TRAIN.BATCH_SIZE 96
  SOLVER.BASE_LR 0.0002
  SOLVER.BASE_LR_SCALE_NUM_SHARDS True
  SOLVER.WARMUP_EPOCHS 10.0
  UNIFORMER.PRETRAIN_NAME ""
  DATA.PM_SUBSET _pmv400
  DATA.PATH_TO_DATA_DIR ./data_list/PMV
  DATA.PATH_LABEL_SEPARATOR ","
  DATA.PATH_PREFIX ${PROJ_DIR}/PMV_dataset/
  MODEL.NUM_CLASSES 400
)

run() {
  OUTPUT_DIR=$1; shift
  python tools/run_net.py \
    --cfg configs/Kinetics/UNIFORMER_S_16x4.yaml \
    --opts "${COMMON_OPTS[@]}" OUTPUT_DIR "$OUTPUT_DIR" "$@"
  # Multi-view test pass (exc_uniformer.sh 2nd invocation):
  python tools/run_net.py \
    --cfg configs/Kinetics/UNIFORMER_S_16x4.yaml \
    --opts "${COMMON_OPTS[@]}" OUTPUT_DIR "$OUTPUT_DIR" "$@" \
    TRAIN.ENABLE False TEST.NUM_ENSEMBLE_VIEWS 4 TEST.NUM_SPATIAL_CROPS 1 \
    DATA.TEST_CROP_SIZE 224
}

# shorter-side recipe
run ${PROJ_DIR}/uniformer_s_pmv/shorter_224 \
  DATA.TRAIN_JITTER_ASPECT_RELATIVE [] DATA.TRAIN_JITTER_SCALES_RELATIVE []

# default Inception-crop recipe
run ${PROJ_DIR}/uniformer_s_pmv/default_224

# rect 256x192
run ${PROJ_DIR}/uniformer_s_pmv/rect_256_192 \
  DATA.TRAIN_JITTER_ASPECT_RELATIVE [] DATA.TRAIN_JITTER_SCALES_RELATIVE [] \
  DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST True DATA.TRAIN_CROP_SIZE_RECT [256,192]

# rect 288x192
run ${PROJ_DIR}/uniformer_s_pmv/rect_288_192 \
  DATA.TRAIN_JITTER_ASPECT_RELATIVE [] DATA.TRAIN_JITTER_SCALES_RELATIVE [] \
  DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST True DATA.TRAIN_CROP_SIZE_RECT [288,192]
