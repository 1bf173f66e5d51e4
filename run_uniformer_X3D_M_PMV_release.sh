#!/bin/bash
# X3D-M PMV-400 release recipe, TPU edition
# (port of `run_uniformer_X3D_M_PMV_release.sh`).
set -e
cd "$(dirname "$0")"

output_dir=${UPLOAD_SOURCE:-./exp/x3d_m_pmv}
mkdir -p "$output_dir"

python tools/run_net.py \
  --cfg configs/Kinetics/X3D_M.yaml \
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
  TRAIN.BATCH_SIZE 64 \
  SOLVER.MAX_EPOCH 300 \
  SOLVER.BASE_LR 0.05 \
  TEST.NUM_ENSEMBLE_VIEWS 1 \
  TEST.NUM_SPATIAL_CROPS 1 \
  TENSORBOARD.ENABLE True \
  OUTPUT_DIR "$output_dir" "$@"
