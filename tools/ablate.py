"""Ablation timing for the MViTv2-S 16x4 train step on the real TPU.

The tunneled backend breaks jax.profiler, so hot-spot hunting is done by
end-to-end step timing under config variants (same machinery as bench.py).
Prints one JSON line per variant: {"variant": ..., "ms_per_step": ...}.

Usage: python tools/ablate.py [variant ...]   (default: all)
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

BATCH = 8


def base_cfg():
    # The shared production recipe (bench.py parity by construction);
    # variants below toggle individual knobs off to re-measure deltas.
    from __graft_entry__ import _mvitv2_s_cfg, apply_bench_recipe

    return apply_bench_recipe(_mvitv2_s_cfg(tiny=False))


VARIANTS = {
    "base": lambda c: c,
    "no_aug": lambda c: _set(c, [("AUG.ENABLE", False)]),
    "no_mixup": lambda c: _set(
        c, [("MIXUP.ENABLE", False), ("MODEL.LOSS_FUNC", "cross_entropy")]
    ),
    "eval_fwd": lambda c: c,  # handled specially: eval step
    "pools_max": lambda c: _set(c, [("MVIT.MODE", "max")]),
    "no_relpos": lambda c: _set(
        c, [("MVIT.REL_POS_SPATIAL", False), ("MVIT.REL_POS_TEMPORAL", False)]
    ),
    "sgd": lambda c: _set(c, [("SOLVER.OPTIMIZING_METHOD", "sgd")]),
    "f32": lambda c: _set(c, [("TPU.COMPUTE_DTYPE", "float32")]),
    "bs16": lambda c: c,  # handled specially: batch 16
    "bs32": lambda c: c,  # handled specially: batch 32
    "bs64": lambda c: c,  # handled specially: batch 64
    "donate": lambda c: c,  # handled specially: donated state buffers
    "no_clip": lambda c: _set(c, [("SOLVER.CLIP_GRAD_L2NORM", 0.0)]),
    "aug_bf16": lambda c: _set(c, [("TPU.PREPROCESS_DTYPE", "bfloat16")]),
    "rbg": lambda c: _set(c, [("TPU.PRNG_IMPL", "rbg")]),
    # DIAGNOSTIC (wrong math, timing only): pools as strided slices.
    "pool_slice": lambda c: _set(c, [("MVIT.POOL_CONV_IMPL", "slice")]),
    "eval_pool_slice": lambda c: _set(c, [("MVIT.POOL_CONV_IMPL", "slice")]),
    "eval_norelpos": lambda c: _set(
        c, [("MVIT.REL_POS_SPATIAL", False), ("MVIT.REL_POS_TEMPORAL", False)]
    ),
    "rbg_aug_bf16": lambda c: _set(
        c, [("TPU.PRNG_IMPL", "rbg"), ("TPU.PREPROCESS_DTYPE", "bfloat16")]
    ),
    "flat_pools": lambda c: _set(c, [("MVIT.FLAT_POOLS", True)]),
    "eval_flat_pools": lambda c: _set(c, [("MVIT.FLAT_POOLS", True)]),
    "remat": lambda c: _set(c, [("MODEL.ACT_CHECKPOINT", True)]),
    "remat_bs16": lambda c: _set(c, [("MODEL.ACT_CHECKPOINT", True)]),
    "remat_bs32": lambda c: _set(c, [("MODEL.ACT_CHECKPOINT", True)]),
    "remat_bs64": lambda c: _set(c, [("MODEL.ACT_CHECKPOINT", True)]),
    # Selective remat: only blocks with >= 5000 input tokens (stage 1-2).
    "remat12": lambda c: _set(c, [("TPU.REMAT_MIN_SEQ", 5000)]),
    "remat12_bs32": lambda c: _set(c, [("TPU.REMAT_MIN_SEQ", 5000)]),
    "remat12_bs64": lambda c: _set(c, [("TPU.REMAT_MIN_SEQ", 5000)]),
    "no_sparse_kv": lambda c: _set(c, [("MVIT.SPARSE_KV_POOL", False)]),
    # DIAGNOSTIC (wrong math, timing only): attention core -> identity /
    # MLP branch removed — prices each inside the full step.
    "diag_attn_ident": lambda c: c,
    "diag_skip_mlp": lambda c: c,
    "diag_skip_attn_branch": lambda c: c,
    "fold_stem": lambda c: _set(c, [("TPU.FOLD_STEM", True)]),
    "eval_fold_stem": lambda c: _set(c, [("TPU.FOLD_STEM", True)]),
    "no_fold_stem": lambda c: _set(c, [("TPU.FOLD_STEM", False)]),
    # DIAGNOSTIC (different model: no cls token, mean-pool head): bounds
    # the cost of the cls split/concat copies around every pool.
    "diag_no_cls": lambda c: _set(c, [("MVIT.CLS_EMBED_ON", False)]),
    "bs4": lambda c: c,
    "per_head": lambda c: _set(c, [("MVIT.ATTN_IMPL", "per_head")]),
    "eval_per_head": lambda c: _set(c, [("MVIT.ATTN_IMPL", "per_head")]),
    "eval_diag_attn_ident": lambda c: c,
    "eval_no_sparse_kv": lambda c: _set(c, [("MVIT.SPARSE_KV_POOL", False)]),
    # RandAugment chain granularity: per-clip (reference sampling,
    # kinetics.py:429-440) became the default after measuring +0.7%
    # (89.16 vs 88.52 ms at bs8); ra_groups2 re-measures the old
    # batch-group sampling.
    "ra_perclip": lambda c: _set(c, [("AUG.RA_GROUPS", -1)]),
    "ra_groups2": lambda c: _set(c, [("AUG.RA_GROUPS", 2)]),
    # Hand-written FlatGroupLN backward (round 3; exactness-tested).
    "flat_ln_vjp": lambda c: _set(c, [("TPU.FLAT_LN_VJP", True)]),
    # Pools layout attack (round 3): the per-op profile attributes 15.7 ms
    # of the 30.4 ms pools bucket to flat<->grid<->heads relayout copies;
    # FLAT_POOLS keeps q/k/v in [B,N,H*C] through the pools.
    "flat_chunk2k": lambda c: _set(
        c, [("MVIT.FLAT_POOLS", True), ("TPU.ATTN_Q_CHUNK", 2048)]
    ),
    "chunk512": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 512)]),
    "chunk1k": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 1024)]),
    "chunk2k": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 2048)]),
    "chunk4k": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 4096)]),
    "chunk8k": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 8192)]),
    "chunk1k_noremat": lambda c: _set(
        c, [("TPU.ATTN_Q_CHUNK", 1024), ("TPU.ATTN_CHUNK_REMAT", False)]
    ),
    # Flat-pools bs32 compile-failure minimization (round 4, VERDICT #6):
    # ungate FLAT_POOLS at batch 32 and bisect the failing graph by
    # truncating depth / removing features until it compiles.
    "flat_bs32": lambda c: _set(c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0)]),
    "flat_bs32_d4": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0), ("MVIT.DEPTH", 4)]
    ),
    "flat_bs32_d2": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0), ("MVIT.DEPTH", 2)]
    ),
    "flat_bs32_d1": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0), ("MVIT.DEPTH", 1)]
    ),
    "flat_bs32_norel": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0),
            ("MVIT.REL_POS_SPATIAL", False),
            ("MVIT.REL_POS_TEMPORAL", False)]
    ),
    "flat_bs32_nochunk": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0), ("TPU.ATTN_Q_CHUNK", 0)]
    ),
    "flat_bs32_noaug": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0), ("AUG.ENABLE", False)]
    ),
    "flat_bs32_nosparse": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0),
            ("MVIT.SPARSE_KV_POOL", False)]
    ),
    "flat_bs32_novjp": lambda c: _set(
        c, [("MVIT.FLAT_POOLS_MAX_BATCH", 0), ("TPU.FLAT_LN_VJP", False)]
    ),
    "chunk2k_noremat": lambda c: _set(
        c, [("TPU.ATTN_Q_CHUNK", 2048), ("TPU.ATTN_CHUNK_REMAT", False)]
    ),
    "chunk1k_bs32": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 1024)]),
    "chunk2k_bs32": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 2048)]),
    # Control for the flat@bs32 remote-compile 500 (round 3): same batch,
    # flat off ("bs32" itself probes flat + the bf16-stats LN).
    "noflat_bs32": lambda c: _set(c, [("MVIT.FLAT_POOLS", False)]),
    "chunk1k_bs64": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 1024)]),
    "chunk2k_bs64": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 2048)]),
    "chunk512_bs64": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 512)]),
    "chunk512_bs48": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 512)]),
    "eval_chunk1k": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 1024)]),
    "eval_chunk2k": lambda c: _set(c, [("TPU.ATTN_Q_CHUNK", 2048)]),
    "pallas_pools": lambda c: _set(c, [("MVIT.USE_PALLAS_POOLS", True)]),
    "auto_pools": lambda c: _set(c, [("MVIT.POOL_CONV_IMPL", "auto")]),
}


def _set(cfg, pairs):
    for key, val in pairs:
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], val)
    return cfg


def make_batch(cfg, batch_size):
    rng_np = np.random.default_rng(0)
    return {
        "frames": jnp.asarray(
            rng_np.integers(
                0, 255,
                (batch_size, cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE,
                 cfg.DATA.TRAIN_CROP_SIZE, 3),
                dtype=np.uint8,
            )
        ),
        "labels": jnp.asarray(
            rng_np.integers(0, cfg.MODEL.NUM_CLASSES, (batch_size,),
                            dtype=np.int64)
        ),
    }


def time_variant(name):
    from pmv_tpu.engine import steps
    from pmv_tpu.models import attention as attn_mod
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib

    attn_mod._DIAG_ATTENTION_IDENTITY = name.endswith("diag_attn_ident")
    attn_mod._DIAG_SKIP_MLP = name == "diag_skip_mlp"
    attn_mod._DIAG_SKIP_ATTN_BRANCH = name == "diag_skip_attn_branch"

    cfg = VARIANTS[name](base_cfg())
    batch_size = {
        "bs4": 4, "bs16": 16, "bs32": 32, "bs64": 64,
        "remat_bs16": 16, "remat_bs32": 32, "remat_bs64": 64,
        "remat12_bs32": 32, "remat12_bs64": 64,
        "chunk1k_bs32": 32, "chunk2k_bs32": 32,
        "chunk1k_bs64": 64, "chunk2k_bs64": 64,
        "chunk512_bs64": 64, "chunk512_bs48": 48,
        "noflat_bs32": 32,
        "flat_bs32": 32, "flat_bs32_d4": 32, "flat_bs32_d2": 32,
        "flat_bs32_d1": 32, "flat_bs32_norel": 32, "flat_bs32_nochunk": 32,
        "flat_bs32_noaug": 32, "flat_bs32_nosparse": 32,
        "flat_bs32_novjp": 32,
    }.get(name, BATCH)
    model = build_model(cfg)
    from pmv_tpu.utils import misc

    rng = misc.root_key(cfg)
    batch = make_batch(cfg, batch_size)
    mesh = mesh_lib.create_mesh()
    state, tx = steps.init_state(cfg, model, batch, rng)
    state = mesh_lib.replicate(state, mesh)
    device_batch = mesh_lib.shard_batch(batch, mesh)

    if name.startswith("eval_"):
        eval_step = jax.jit(steps.make_eval_step(cfg, model))

        def run():
            return eval_step(state, device_batch["frames"])

        for _ in range(2):
            jax.device_get(jnp.sum(run().astype(jnp.float32)))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / n * 1e3
    else:
        donate = (0,) if name == "donate" else ()
        train_step = jax.jit(
            steps.make_train_step(cfg, model, tx), donate_argnums=donate
        )
        for _ in range(2):
            state, metrics = train_step(state, device_batch, rng, 1e-4)
            jax.device_get(metrics["loss"])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = train_step(state, device_batch, rng, 1e-4)
        jax.device_get(metrics["loss"])
        ms = (time.perf_counter() - t0) / n * 1e3
    print(
        json.dumps({"variant": name, "batch": batch_size,
                    "ms_per_step": round(ms, 2)}),
        flush=True,
    )


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        t0 = time.perf_counter()
        try:
            time_variant(name)
        except Exception as e:  # keep going; report
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
        print(f"# {name}: total {time.perf_counter()-t0:.0f}s (incl compile)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
