#!/usr/bin/env python3
"""SLURM cluster launcher (`Uniformer/tools/summit.py:81-203` equivalent).

The reference uses submitit; this generates and submits an sbatch script
with requeue-on-preemption (auto-resume restores from the last checkpoint,
so preemption is lossless — `TRAIN.AUTO_RESUME` + `utils/checkpoint.py`).

Usage:
    python tools/summit.py --cfg configs/... --partition my-part \
        --num-shards 4 --gpus-per-node 8 [--opts K V ...]
"""

import argparse
import os
import subprocess
import sys

SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --partition={partition}
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus}
#SBATCH --output={output_dir}/slurm-%j.out
#SBATCH --signal=USR1@120
#SBATCH --requeue
{extra}

export MASTER_ADDR=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export MASTER_PORT={port}

srun python {run_net} \\
  --cfg {cfg} \\
  --num_shards {nodes} \\
  --shard_id $SLURM_NODEID \\
  --init_method tcp://$MASTER_ADDR:$MASTER_PORT \\
  --opts OUTPUT_DIR {output_dir} TRAIN.AUTO_RESUME True {opts}
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--name", default="pmv_tpu")
    ap.add_argument("--partition", default="tpu")
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--cpus", type=int, default=96)
    ap.add_argument("--port", type=int, default=28999)
    ap.add_argument("--output-dir", default="./slurm_runs")
    ap.add_argument("--extra-sbatch", default="")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    run_net = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "run_net.py")
    )
    script = SBATCH_TEMPLATE.format(
        name=args.name,
        partition=args.partition,
        nodes=args.num_shards,
        cpus=args.cpus,
        output_dir=os.path.abspath(args.output_dir),
        port=args.port,
        run_net=run_net,
        cfg=os.path.abspath(args.cfg),
        opts=" ".join(args.opts),
        extra=args.extra_sbatch,
    )
    path = os.path.join(args.output_dir, f"{args.name}.sbatch")
    with open(path, "w") as f:
        f.write(script)
    print(f"sbatch script written to {path}")
    if args.dry_run:
        print(script)
        return
    subprocess.run(["sbatch", path], check=True)


if __name__ == "__main__":
    main()
