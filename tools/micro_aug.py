#!/usr/bin/env python3
"""Per-op timing of the on-device augmentation chain (TPU).

The full RandAugment+erasing block costs ~12-14 ms of the ~100 ms train
step (tools/ablate.py no_aug delta); this prices each op standalone at the
bench geometry ([8,16,224,224,3]) so kernel work targets the real sinks.

Prints one JSON line per op: {"op": ..., "ms": ...}.
Usage: python tools/micro_aug.py [op ...]
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

from pmv_tpu.data import rand_augment as ra
from pmv_tpu.data.random_erasing import random_erasing

B, T, S = 8, 16, 224


def _time(fn, *args):
    out = jax.jit(fn)(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))  # warm
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.jit(fn)(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng_np = np.random.default_rng(0)
    frames = jnp.asarray(
        rng_np.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8)
    ).astype(jnp.float32)
    key = jax.random.PRNGKey(0)

    per_image_ops = {
        "rotate": lambda x: ra._rotate(x, 20.0),
        "shear_x": lambda x: ra._shear_x(x, 0.2),
        "translate_x": lambda x: ra._translate_x(x, 30.0),
        "color": lambda x: ra._color(x, 1.4),
        "contrast": lambda x: ra._contrast(x, 1.4),
        "brightness": lambda x: ra._brightness(x, 1.4),
        "sharpness": lambda x: ra._sharpness(x, 1.4),
        "invert": lambda x: ra._invert(x, 0.0),
        "autocontrast": lambda x: ra._autocontrast(x, 0.0),
        "equalize": lambda x: ra._equalize(x, 0.0),
        "posterize": lambda x: ra._posterize(x, 4.0),
        "solarize": lambda x: ra._solarize(x, 128.0),
    }
    names = sys.argv[1:] or (
        list(per_image_ops) + ["erasing", "normalize", "chain_m7n4"]
    )
    for name in names:
        try:
            if name in per_image_ops:
                op = per_image_ops[name]
                ms = _time(lambda x: jax.vmap(op)(x), frames)
            elif name == "erasing":
                ms = _time(
                    lambda k, x: random_erasing(k, x, probability=1.0),
                    key, frames,
                )
            elif name == "normalize":
                mean = jnp.asarray([0.45, 0.45, 0.45]) * 255.0
                inv = 1.0 / (jnp.asarray([0.225, 0.225, 0.225]) * 255.0)
                ms = _time(lambda x: (x - mean) * inv, frames)
            elif name == "chain_m7n4":
                aug = ra.RandAugment("rand-m7-n4-mstd0.5-inc1")
                ms = _time(
                    lambda k, x: aug.apply_batch(k, x, groups=2), key, frames
                )
            else:
                raise KeyError(name)
            print(json.dumps({"op": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(
                json.dumps({"op": name, "error": str(e)[:160]}), flush=True
            )


if __name__ == "__main__":
    main()
