#!/usr/bin/env python3
"""Train-step throughput across model families (clips/s/chip, real TPU).

bench.py tracks the flagship MViTv2-S recipe; this sweeps the other PMV
families with their recipe batch sizes scaled to one chip so perf work
covers the whole zoo (`exps/PMV/run_{Uniformer,X3D}_PMV.sh` recipes,
UniFormer-S 16x4 bs 96/8GPU -> 12, X3D-M bs 64/8 -> 8).

Prints one JSON line per family. Each row carries extrapolated v5p/v6e
columns (VERDICT r4 #7) under the stated model: the measured step is
HBM-bandwidth-bound (ROADMAP byte ledger), so step time scales with the
HBM-bandwidth ratio (v5p 2765 GB/s = 3.38x v5e's 819, v6e 1640 = 2.0x);
the extrapolation is an upper bound where a family is compute-bound.
Usage: python tools/family_bench.py [family ...]   (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (yaml, per-chip batch, train-recipe aug per exps/PMV scripts)
FAMILIES = {
    "uniformer_s_16x4": ("Kinetics/UNIFORMER_S_16x4_K400_exp.yaml", 12, True),
    "x3d_m": ("Kinetics/X3D_M.yaml", 8, False),
    "slowfast_8x8": ("Kinetics/SLOWFAST_8x8_R50.yaml", 8, False),
    "slow_8x8": ("Kinetics/SLOW_8x8_R50.yaml", 8, False),
    "i3d_8x8": ("Kinetics/I3D_8x8_R50.yaml", 8, False),
    "c2d_8x8": ("Kinetics/C2D_8x8_R50.yaml", 8, False),
    "mvitv2_s_16x4": ("Kinetics/MVITv2_S_16x4.yaml", 8, True),
}


def family_cfg(yaml_rel, aug):
    from pmv_tpu.config import get_cfg
    from pmv_tpu.config.defaults import assert_and_infer_cfg

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", yaml_rel))
    cfg.NUM_GPUS = 1
    cfg.NUM_SHARDS = 1
    cfg.DATA_LOADER.NUM_WORKERS = 0
    if aug and not cfg.AUG.ENABLE:
        cfg.AUG.ENABLE = True
        cfg.AUG.AA_TYPE = cfg.AUG.AA_TYPE or "rand-m7-n4-mstd0.5-inc1"
    cfg.TPU.PRNG_IMPL = "rbg"
    cfg.TPU.PREPROCESS_DTYPE = "bfloat16"
    cfg.TPU.ATTN_Q_CHUNK = 2048  # consumed by MViT attention only
    return assert_and_infer_cfg(cfg)


V5P_BW_RATIO = 2765.0 / 819.0
V6E_BW_RATIO = 1640.0 / 819.0


def time_family(name):
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib
    from pmv_tpu.utils import misc

    yaml_rel, batch, aug = FAMILIES[name]
    cfg = family_cfg(yaml_rel, aug)
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    rng_np = np.random.default_rng(0)
    batch_np = {
        "frames": jnp.asarray(
            rng_np.integers(
                0, 255,
                (batch, cfg.DATA.NUM_FRAMES,
                 cfg.DATA.TRAIN_CROP_SIZE, cfg.DATA.TRAIN_CROP_SIZE, 3),
                dtype=np.uint8,
            )
        ),
        "labels": jnp.asarray(
            rng_np.integers(0, cfg.MODEL.NUM_CLASSES, (batch,),
                            dtype=np.int64)
        ),
    }
    mesh = mesh_lib.create_mesh()
    state, tx = steps.init_state(cfg, model, batch_np, rng)
    state = mesh_lib.replicate(state, mesh)
    device_batch = mesh_lib.shard_batch(batch_np, mesh)
    train_step = jax.jit(steps.make_train_step(cfg, model, tx))
    for _ in range(2):
        state, metrics = train_step(state, device_batch, rng, 1e-4)
        jax.device_get(metrics["loss"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = train_step(state, device_batch, rng, 1e-4)
    jax.device_get(metrics["loss"])
    dt = time.perf_counter() - t0
    _report(name, batch, dt, n)


def _report(name, batch, dt, n):
    cps = batch * n / dt
    print(
        json.dumps(
            {
                "family": name,
                "batch": batch,
                "ms_per_step": round(dt / n * 1e3, 2),
                "clips_per_sec_per_chip": round(cps, 2),
                # Bandwidth-model extrapolations (see module docstring).
                "v5p_extrap_bw_bound": round(cps * V5P_BW_RATIO, 1),
                "v6e_extrap_bw_bound": round(cps * V6E_BW_RATIO, 1),
            }
        ),
        flush=True,
    )


def _time_loop(step, state, args, n=10):
    for _ in range(2):
        state, metrics = step(state, *args)
        jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, *args)
    jax.device_get(metrics["loss"])
    return time.perf_counter() - t0, n


def time_contrastive(name="contrastive_moco"):
    """MoCo SlowR50 8x8 train step (ssl_steps.make_ssl_train_step),
    2 temporal views/clip; recipe bs 64/8GPU -> 8/chip."""
    from pmv_tpu.engine import ssl_steps
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib
    from pmv_tpu.utils import misc

    cfg = family_cfg("contrastive_ssl/MoCo_SlowR50_8x8.yaml", False)
    batch = 8
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    rng_np = np.random.default_rng(0)
    s = cfg.DATA.TRAIN_CROP_SIZE
    frames = jnp.asarray(rng_np.integers(
        0, 255, (batch, 2, cfg.DATA.NUM_FRAMES, s, s, 3), dtype=np.uint8))
    index = jnp.arange(batch)
    mesh = mesh_lib.create_mesh()
    state, tx = ssl_steps.init_ssl_state(
        cfg, model, {"frames": frames[:, 0], "index": index}, rng)
    state = mesh_lib.replicate(state, mesh)
    db = mesh_lib.shard_batch({"frames": frames, "index": index}, mesh)
    step = jax.jit(ssl_steps.make_ssl_train_step(cfg, model, tx))
    dt, n = _time_loop(step, state, (db, rng, 1e-4))
    _report(name, batch, dt, n)


def time_masked(name="maskmvit_pt"):
    """MaskFeat MViTv2-S 16x4 pretrain step (HOG regression); recipe bs
    32/8GPU -> 4/chip."""
    from pmv_tpu.engine import ssl_steps
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib
    from pmv_tpu.utils import misc

    cfg = family_cfg("masked_ssl/k400_MVITv2_S_16x4_MaskFeat_PT.yaml", False)
    batch = 4
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    rng_np = np.random.default_rng(0)
    s = cfg.DATA.TRAIN_CROP_SIZE
    frames = jnp.asarray(rng_np.integers(
        0, 255, (batch, cfg.DATA.NUM_FRAMES, s, s, 3), dtype=np.uint8))
    mesh = mesh_lib.create_mesh()
    state, tx = ssl_steps.init_masked_state(cfg, model, {"frames": frames}, rng)
    state = mesh_lib.replicate(state, mesh)
    db = mesh_lib.shard_batch({"frames": frames}, mesh)
    step = jax.jit(ssl_steps.make_masked_train_step(cfg, model, tx))
    dt, n = _time_loop(step, state, (db, rng, 1e-4))
    _report(name, batch, dt, n)


def time_detection(name="ava_slow_detection"):
    """AVA Slow-R50 detection train step (RoIAlign head + box supervision);
    reference recipe bs 64/8GPU -> 8/chip."""
    import jax.numpy as jnp  # noqa: F811

    from pmv_tpu.engine import steps
    from pmv_tpu.engine.train_state import TrainState  # noqa: F401
    from pmv_tpu.models import build_model
    from pmv_tpu.models import optimizer as optim
    from pmv_tpu.parallel import mesh as mesh_lib
    from pmv_tpu.utils import misc

    cfg = family_cfg("AVA/SLOW_8x8_R50_SHORT.yaml", False)
    cfg.DETECTION.ENABLE = True
    batch, n_boxes = 8, 5
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    rng_np = np.random.default_rng(0)
    s = cfg.DATA.TRAIN_CROP_SIZE
    frames = rng_np.integers(
        0, 255, (batch, cfg.DATA.NUM_FRAMES, s, s, 3), dtype=np.uint8)
    boxes = rng_np.uniform(0, s, (batch, n_boxes, 4)).astype(np.float32)
    boxes = np.sort(boxes.reshape(batch, n_boxes, 2, 2), axis=2).reshape(
        batch, n_boxes, 4)[:, :, [0, 2, 1, 3]]
    labels = rng_np.integers(
        0, 2, (batch, n_boxes, cfg.MODEL.NUM_CLASSES)).astype(np.float32)
    box_mask = np.ones((batch, n_boxes), bool)
    batch_np = {
        "frames": frames, "boxes": boxes, "labels": labels,
        "box_mask": box_mask,
    }
    mesh = mesh_lib.create_mesh()
    x = frames.astype(np.float32)
    inputs = steps.pack_pathways(cfg, jnp.asarray(x))
    xs = inputs[0] if len(inputs) == 1 else inputs
    variables = jax.jit(
        lambda k: model.init(
            k, xs, train=False, boxes=jnp.asarray(boxes),
            box_mask=jnp.asarray(box_mask),
        )
    )(rng)
    tx = optim.construct_optimizer(variables["params"], cfg)
    from pmv_tpu.engine.train_state import TrainState as TS

    state = TS(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    state = mesh_lib.replicate(state, mesh)
    db = mesh_lib.shard_batch(batch_np, mesh)
    step = jax.jit(steps.make_detection_train_step(cfg, model, tx))
    dt, n = _time_loop(step, state, (db, rng, 1e-4))
    _report(name, batch, dt, n)


def time_avslowfast(name="avslowfast_8x8"):
    """AVSlowFast 8x8-R50 train step (audio-visual, AVS loss + misaligned
    audio per the reference recipe); recipe bs 64/8GPU -> 8/chip."""
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib
    from pmv_tpu.utils import misc

    cfg = family_cfg("Kinetics/AVSLOWFAST_8x8_R50.yaml", False)
    batch = 8
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    rng_np = np.random.default_rng(0)
    s = cfg.DATA.TRAIN_CROP_SIZE
    frames = jnp.asarray(rng_np.integers(
        0, 255, (batch, cfg.DATA.NUM_FRAMES, s, s, 3), dtype=np.uint8))
    audio_shape = (batch, cfg.DATA.AUDIO_FRAME_NUM, cfg.DATA.AUDIO_MEL_NUM)
    audio = jnp.asarray(
        rng_np.standard_normal(audio_shape), jnp.float32)
    audio_mis = jnp.asarray(
        rng_np.standard_normal(audio_shape), jnp.float32)
    labels = jnp.asarray(rng_np.integers(
        0, cfg.MODEL.NUM_CLASSES, (batch,), dtype=np.int64))
    b = {"frames": frames, "labels": labels, "audio": audio,
         "audio_mis": audio_mis}
    mesh = mesh_lib.create_mesh()
    state, tx = steps.init_state(cfg, model, b, rng)
    state = mesh_lib.replicate(state, mesh)
    db = mesh_lib.shard_batch(b, mesh)
    step = jax.jit(steps.make_train_step(cfg, model, tx))
    dt, n = _time_loop(step, state, (db, rng, 1e-4))
    _report(name, batch, dt, n)


SPECIAL = {
    "contrastive_moco": time_contrastive,
    "avslowfast_8x8": time_avslowfast,
    "maskmvit_pt": time_masked,
    "ava_slow_detection": time_detection,
}


def main():
    names = sys.argv[1:] or list(FAMILIES) + list(SPECIAL)
    for name in names:
        try:
            if name in SPECIAL:
                SPECIAL[name]()
            else:
                time_family(name)
        except Exception as e:
            print(json.dumps({"family": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
