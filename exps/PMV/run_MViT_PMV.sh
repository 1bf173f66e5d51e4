#!/bin/bash
# MViTv2-S 16x4 PMV-400 recipes (port of the reference exps/PMV/run_MViT_PMV.sh:
# same hyperparameters; the launcher is single-controller JAX so no
# per-GPU process spawn — NUM_GPUS is kept for config parity and the mesh
# covers all local chips). Multi-host: add --num_shards/--shard_id/
# --init_method like the reference release scripts.
set -e
PROJ_DIR=${PROJ_DIR:-"YOU_PROJECT_DIR"}
cd "$(dirname "$0")/../.."

COMMON_OPTS=(
  DATA_LOADER.NUM_WORKERS 10
  DATA.DECODING_BACKEND ffmpeg
  DATA.TRAIN_CROP_SIZE 224
  SOLVER.MAX_EPOCH 200
  TRAIN.BATCH_SIZE 32
  SOLVER.BASE_LR 1e-4
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
    --cfg configs/Kinetics/MVITv2_S_16x4.yaml \
    --opts "${COMMON_OPTS[@]}" OUTPUT_DIR "$OUTPUT_DIR" "$@"
}

# 1) default square-crop Inception-style recipe
run ${PROJ_DIR}/mvitv2_s_pmv/default_224

# 2) shorter-side recipe (disable relative jitter)
run ${PROJ_DIR}/mvitv2_s_pmv/shorter_224 \
  DATA.TRAIN_JITTER_ASPECT_RELATIVE [] DATA.TRAIN_JITTER_SCALES_RELATIVE []

# 3) rect 256x192 portrait crop
run ${PROJ_DIR}/mvitv2_s_pmv/rect_256_192 \
  DATA.TRAIN_JITTER_ASPECT_RELATIVE [] DATA.TRAIN_JITTER_SCALES_RELATIVE [] \
  DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST True DATA.TRAIN_CROP_SIZE_RECT [256,192]

# 4) rect 288x192 portrait crop
run ${PROJ_DIR}/mvitv2_s_pmv/rect_288_192 \
  DATA.TRAIN_JITTER_ASPECT_RELATIVE [] DATA.TRAIN_JITTER_SCALES_RELATIVE [] \
  DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST True DATA.TRAIN_CROP_SIZE_RECT [288,192]
