"""Per-block timing for MViTv2-S 16x4 on the real TPU.

jax.profiler hangs over the tunneled backend, so each MultiScaleBlock is
jitted and timed in isolation at its real (bs 8) shapes, fwd and fwd+bwd.
Dispatch floor (~4 ms) is reported alongside; subtract mentally.

Usage: python tools/block_profile.py [block_idx ...]  (default: 0,1,2,3,4,14,15)
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


def main():
    from __graft_entry__ import _mvitv2_s_cfg
    from pmv_tpu.models.attention import MultiScaleBlock
    from pmv_tpu.models.mvit import _compute_mvit_schedule

    cfg = _mvitv2_s_cfg(tiny=False)
    schedule = _compute_mvit_schedule(cfg)
    depth = cfg.MVIT.DEPTH

    # Token grid per block (patch stride (2,4,4) on 16x224x224 -> 8x56x56).
    input_size = [8, 56, 56]
    sizes = []
    for i in range(depth):
        sizes.append(tuple(input_size))
        if len(schedule[i]["stride_q"]) > 0:
            input_size = [
                s // st for s, st in zip(input_size, schedule[i]["stride_q"])
            ]

    which = [int(a) for a in sys.argv[1:]] or [0, 1, 2, 3, 4, 14, 15]
    rng = np.random.default_rng(0)
    for i in which:
        spec = schedule[i]
        thw = sizes[i]
        n_tok = int(np.prod(thw)) + 1  # cls
        x = jnp.asarray(
            rng.normal(size=(BATCH, n_tok, spec["dim"])), jnp.bfloat16
        )
        block = MultiScaleBlock(
            dim=spec["dim"],
            dim_out=spec["dim_out"],
            num_heads=spec["num_heads"],
            input_size=thw,
            mlp_ratio=cfg.MVIT.MLP_RATIO,
            qkv_bias=cfg.MVIT.QKV_BIAS,
            kernel_q=spec["kernel_q"],
            kernel_kv=spec["kernel_kv"],
            stride_q=spec["stride_q"],
            stride_kv=spec["stride_kv"],
            mode=cfg.MVIT.MODE,
            has_cls_embed=cfg.MVIT.CLS_EMBED_ON,
            rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
            rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
            residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
            dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
            use_pallas_pools=cfg.MVIT.USE_PALLAS_POOLS,
            dtype=jnp.bfloat16,
        )
        params = block.init(jax.random.PRNGKey(0), x, thw, False)

        fwd = jax.jit(
            lambda p, x: jnp.sum(
                block.apply(p, x, thw, False)[0].astype(jnp.float32)
            )
        )
        gfn = jax.jit(
            jax.grad(
                lambda p, x: jnp.sum(
                    block.apply(p, x, thw, False)[0].astype(jnp.float32) ** 2
                ),
                argnums=(0, 1),
            )
        )

        def timeit(f, *a, n=10):
            jax.device_get(jax.tree.leaves(f(*a))[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(*a)
            jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
            return (time.perf_counter() - t0) / n * 1e3

        r = {
            "block": i,
            "dim": spec["dim"],
            "dim_out": spec["dim_out"],
            "heads": spec["num_heads"],
            "thw": list(thw),
            "stride_q": list(spec["stride_q"]),
            "fwd_ms": round(timeit(fwd, params, x), 2),
            "fwdbwd_ms": round(timeit(gfn, params, x), 2),
        }
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
