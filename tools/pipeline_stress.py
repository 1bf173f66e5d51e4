#!/usr/bin/env python3
"""Real-data input-pipeline stress: native decode + loader + train step.

Replaces the round-1 extrapolation ("the loader microbench says N
clips/s/core, real hosts have more cores") with a measured, same-process
number: the threaded loader decodes a real on-disk video corpus through
the C++ FFmpeg path while the full MViTv2-S train step runs on the
accelerator, and we report both sides plus the step's data-wait fraction.

Reference behavior being stress-tested: the DataLoader-worker decode
pipeline feeding train_epoch (`MViT/tools/train_net.py:77-111`,
`MViT/slowfast/datasets/kinetics.py:181-534`).

Usage:
  python tools/pipeline_stress.py [--batch 32] [--steps 50] \
      [--corpus /tmp/pmv_corpus] [--make-corpus N_VIDEOS]

Prints one JSON line:
  {"loader_clips_per_s": ..., "step_clips_per_s": ...,
   "combined_clips_per_s": ..., "data_wait_frac": ...,
   "host_cores": ..., "step_bound_at_cores": ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))


def make_corpus(root, n_videos):
    import numpy as np

    from pmv_tpu.native import binding

    os.makedirs(os.path.join(root, "videos"), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    yy0, xx0 = np.mgrid[0:640, 0:360].astype(np.float32)
    for i in range(n_videos):
        # Mostly portrait 360x640, some landscape — PMV-400-like mix,
        # H.264 mp4 like the real corpus (`DATA.md:6`): decode throughput
        # must include codec work, not just rawvideo demux.
        h, w = (640, 360) if i % 4 else (360, 640)
        yy, xx = (yy0, xx0) if i % 4 else (yy0.T, xx0.T)
        ph = rng.uniform(0, 6.28, 3)
        frames = np.empty((120, h, w, 3), np.uint8)
        for t in range(120):
            for c in range(3):
                frames[t, :, :, c] = np.clip(
                    90
                    + 70 * np.sin(2 * np.pi * (xx / w) + 0.21 * t + ph[c])
                    + 50 * np.cos(2 * np.pi * (yy / h) - 0.13 * t),
                    0, 255,
                ).astype(np.uint8)
        name = f"v{i:03d}.mp4"
        binding.write_video_h264(
            os.path.join(root, "videos", name), frames, fps=30, gop=30,
            crf=23,
        )
        rows.append(f"{name},{i % 10}")
    for split in ("train", "val", "test"):
        with open(os.path.join(root, f"{split}_pmv400.csv"), "w") as f:
            f.write("\n".join(rows) + "\n")
    print(f"# corpus: {n_videos} videos at {root}", file=sys.stderr)


def stress_cfg(corpus, batch):
    from __graft_entry__ import _mvitv2_s_cfg

    cfg = _mvitv2_s_cfg(tiny=False)
    cfg.DATA.PATH_TO_DATA_DIR = corpus
    cfg.DATA.PATH_PREFIX = os.path.join(corpus, "videos")
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.MODEL.NUM_CLASSES = 400
    cfg.TRAIN.BATCH_SIZE = batch
    cfg.TRAIN.DATASET = "kinetics"
    cfg.DATA_LOADER.NUM_WORKERS = max(2, (os.cpu_count() or 1))
    # Full PMV train recipe (bench.py parity).
    cfg.AUG.ENABLE = True
    cfg.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"
    cfg.AUG.RE_PROB = 0.25
    cfg.TPU.PRNG_IMPL = "rbg"
    cfg.TPU.PREPROCESS_DTYPE = "bfloat16"
    cfg.TPU.ATTN_Q_CHUNK = 2048
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--corpus", default="/tmp/pmv_corpus")
    ap.add_argument("--make-corpus", type=int, default=0)
    ap.add_argument("--loader-batches", type=int, default=12)
    ap.add_argument("--prefetch", type=int, default=0,
                    help="DevicePrefetcher depth for phase C (0 = sync)")
    ap.add_argument("--synthetic", action="store_true",
                    help="phase C feeds pre-built host batches (instant "
                    "producer) — isolates the H2D-overlap win from decode "
                    "starvation on small hosts")
    args = ap.parse_args()

    if args.make_corpus:
        make_corpus(args.corpus, args.make_corpus)
    assert os.path.exists(
        os.path.join(args.corpus, "train_pmv400.csv")
    ), "no corpus; run with --make-corpus N"

    import jax
    import numpy as np

    from pmv_tpu.data import loader as loader_mod
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib
    from pmv_tpu.utils import misc

    cfg = stress_cfg(args.corpus, args.batch)
    loader = loader_mod.construct_loader(cfg, "train")
    loader.set_epoch(0)

    # --- Phase A: loader-only decode rate (steady state, skip first batch).
    it = iter(loader)
    first = next(it)
    t0 = time.perf_counter()
    n_clips = 0
    for _ in range(args.loader_batches):
        b = next(it, None)
        if b is None:
            it = iter(loader)
            b = next(it)
        n_clips += len(b["labels"])
    loader_rate = n_clips / (time.perf_counter() - t0)

    # --- Phase B: step-only rate on a cached batch (bench.py parity).
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    batch = {"frames": first["frames"], "labels": first["labels"]}
    mesh = mesh_lib.create_mesh()
    state, tx = steps.init_state(cfg, model, batch, rng)
    state = mesh_lib.replicate(state, mesh)
    device_batch = mesh_lib.shard_batch(batch, mesh)
    train_step = jax.jit(steps.make_train_step(cfg, model, tx))
    for _ in range(2):
        state, metrics = train_step(state, device_batch, rng, 1e-4)
        jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    n_bench = 10
    for _ in range(n_bench):
        state, metrics = train_step(state, device_batch, rng, 1e-4)
    jax.device_get(metrics["loss"])
    step_rate = args.batch * n_bench / (time.perf_counter() - t0)

    # --- Phase C: combined loop — real batches through the jitted step.
    # With --prefetch this is the production train_epoch handoff
    # (TPU.DEVICE_PREFETCH): a background thread enqueues the transfer of
    # batch N+1 while step N runs; data_wait then measures only the
    # residual queue stall.
    def _prep(b):
        return mesh_lib.shard_batch(
            {"frames": b["frames"], "labels": b["labels"]}, mesh
        )

    class _Cycle:
        def __iter__(self):
            while True:
                yield from loader

    if args.synthetic:
        # Two distinct host batches (so H2D really transfers per step, no
        # aliasing), yielded with zero producer latency.
        rng_np = np.random.default_rng(1)
        synth = [
            {
                "frames": rng_np.integers(
                    0, 255, first["frames"].shape, dtype=np.uint8
                ),
                "labels": np.asarray(first["labels"]),
            }
            for _ in range(2)
        ]

        class _Cycle:  # noqa: F811 - deliberate override for phase C
            def __iter__(self):
                i = 0
                while True:
                    yield synth[i % 2]
                    i += 1

    if args.prefetch > 0:
        from pmv_tpu.engine.prefetch import DevicePrefetcher

        stream = iter(DevicePrefetcher(_Cycle(), _prep, depth=args.prefetch))
    else:
        stream = ((b, _prep(b)) for b in iter(_Cycle()))
    t_all0 = time.perf_counter()
    data_wait = 0.0
    n_steps = 0
    while n_steps < args.steps:
        t_d = time.perf_counter()
        _, db = next(stream)
        data_wait += time.perf_counter() - t_d
        state, metrics = train_step(state, db, rng, 1e-4)
        n_steps += 1
    jax.device_get(metrics["loss"])
    t_all = time.perf_counter() - t_all0
    combined_rate = args.batch * n_steps / t_all

    cores = os.cpu_count() or 1
    per_core = loader_rate / cores
    print(
        json.dumps(
            {
                "loader_clips_per_s": round(loader_rate, 2),
                "step_clips_per_s": round(step_rate, 2),
                "combined_clips_per_s": round(combined_rate, 2),
                "data_wait_frac": round(data_wait / t_all, 3),
                "host_cores": cores,
                "loader_clips_per_s_per_core": round(per_core, 2),
                # Cores needed for the decode side to outpace the step.
                "step_bound_at_cores": int(np.ceil(step_rate / per_core)),
                "batch": args.batch,
                "steps": n_steps,
                "prefetch": args.prefetch,
            }
        )
    )


if __name__ == "__main__":
    main()
