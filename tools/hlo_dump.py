"""Dump the optimized HLO of the MViTv2-S train step + XLA cost analysis.

jax.profiler hangs over the tunneled backend (ROADMAP), so this is the
per-op attribution window: AOT-compile the exact bench step, write the
optimized module text (with layouts) to /tmp/mvit_hlo/, and print the
compiled cost analysis. Reading the fusion list shows what XLA actually
scheduled: physical layouts, transposes/pads it inserted, which ops fused.

Usage: python tools/hlo_dump.py [train|eval] [batch_size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _mvitv2_s_cfg, apply_bench_recipe
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib

    which = sys.argv[1] if len(sys.argv) > 1 else "train"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # The exact bench.py program (VERDICT r4 missing #2: attribution must
    # be of the CURRENT recipe, not the round-2 one).
    cfg = apply_bench_recipe(_mvitv2_s_cfg(tiny=False))
    if "flat" in sys.argv[3:]:
        # Keep FLAT_POOLS on above the batch gate (the measured-faster
        # config at bs32; the gate predates the fixed compile server).
        cfg.MVIT.FLAT_POOLS_MAX_BATCH = 0
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)
    batch = {
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
    mesh = mesh_lib.create_mesh()
    state, tx = steps.init_state(cfg, model, batch, rng)
    state = mesh_lib.replicate(state, mesh)
    device_batch = mesh_lib.shard_batch(batch, mesh)

    if which == "eval":
        fn = jax.jit(steps.make_eval_step(cfg, model))
        lowered = fn.lower(state, device_batch["frames"])
    else:
        fn = jax.jit(steps.make_train_step(cfg, model, tx))
        lowered = fn.lower(state, device_batch, rng, 1e-4)

    compiled = lowered.compile()
    os.makedirs("/tmp/mvit_hlo", exist_ok=True)
    out_path = f"/tmp/mvit_hlo/{which}_bs{batch_size}{'_flat' if 'flat' in sys.argv[3:] else ''}.txt"
    try:
        txt = compiled.as_text()
        with open(out_path, "w") as f:
            f.write(txt)
        print(f"# optimized HLO -> {out_path} ({len(txt)} bytes)")
    except Exception as e:
        print(f"# as_text failed: {e}")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        for k in sorted(ca):
            v = ca[k]
            if isinstance(v, float) and v > 1e6:
                print(f"{k}: {v:.3e}")
    except Exception as e:
        print(f"# cost_analysis failed: {e}")
    try:
        mem = compiled.memory_analysis()
        print(mem)
    except Exception as e:
        print(f"# memory_analysis failed: {e}")


if __name__ == "__main__":
    main()
