#!/bin/bash
# UniFormer-S 16x4 PMV-400 release recipe, TPU edition.
#
# Port of the reference's root launcher (`run_uniformer_s16x4_PMV_release.sh`):
# env-var driven multi-host launch — WORKER_0_HOST / WORKER_NUM / WORKER_ID
# become the jax.distributed coordinator + process grid instead of a torch
# TCP process group. Extra --opts pairs append via "$@" exactly as upstream.
set -e
cd "$(dirname "$0")"

output_dir=${UPLOAD_SOURCE:-./exp/uniformer_s16x4_pmv}
mkdir -p "$output_dir"

python tools/run_net.py \
  --cfg configs/Kinetics/UNIFORMER_S_16x4.yaml \
  --init_method "${WORKER_0_HOST:-localhost}:28999" \
  --num_shards "${WORKER_NUM:-1}" \
  --shard_id "${WORKER_ID:-0}" \
  --opts \
  SOLVER.BASE_LR_SCALE_NUM_SHARDS True \
  DATA.PATH_TO_DATA_DIR ./data/data_list/PMV \
  DATA.PATH_LABEL_SEPARATOR "," \
  DATA.PM_SUBSET _pmv400 \
  MODEL.NUM_CLASSES 400 \
  DATA_LOADER.NUM_WORKERS 5 \
  TRAIN.EVAL_PERIOD 5 \
  TRAIN.CHECKPOINT_PERIOD 1 \
  TRAIN.BATCH_SIZE 96 \
  UNIFORMER.DROP_DEPTH_RATE 0.1 \
  SOLVER.MAX_EPOCH 110 \
  SOLVER.BASE_LR 3e-4 \
  SOLVER.WARMUP_EPOCHS 10.0 \
  DATA.TEST_CROP_SIZE 224 \
  TEST.NUM_ENSEMBLE_VIEWS 1 \
  TEST.NUM_SPATIAL_CROPS 1 \
  RNG_SEED 6666 \
  MODEL.USE_CHECKPOINT True \
  MODEL.CHECKPOINT_NUM [0,0,1,0] \
  TENSORBOARD.ENABLE True \
  OUTPUT_DIR "$output_dir" "$@"
