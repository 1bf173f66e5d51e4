"""Host-side augmentation cost probe (VERDICT r4 next-round #4).

The reference runs RandAugment + RandomErasing in CPU dataloader workers
(`/root/reference/MViT/slowfast/datasets/kinetics.py:429-440`); pmv_tpu
runs them on-device inside the jitted step (~3.6 ms of the ~83 ms step,
r2 ablation). Moving them to the host would (a) shrink the device step,
(b) make the bench apples-to-apples with the A100 baseline — IF the host
can absorb the cost within its measured 2.7x decode headroom.

This probe measures the host price directly: it imports the reference's
own PIL rand_augment module (timm-derived, self-contained) and times
m7-n4 RandAugment + erasing on DATA-shaped clips (16 frames, 224x224),
per core. Combine with the on-chip no_aug ablation (tools/ablate.py
no_aug) for the adopt/refute decision.

Usage: python tools/host_aug_probe.py [n_clips]
"""

import importlib.util
import os
import random
import sys
import time

import numpy as np

REF_RA = os.environ.get(
    "PMV_REF_RAND_AUGMENT",
    "/root/reference/MViT/slowfast/datasets/rand_augment.py",
)
REF_RE = os.environ.get(
    "PMV_REF_RANDOM_ERASING",
    "/root/reference/MViT/slowfast/datasets/random_erasing.py",
)


def _import(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    t_frames, size = 16, 224
    if not os.path.exists(REF_RA):
        sys.exit(f"reference rand_augment not found at {REF_RA}")
    ra = _import(REF_RA, "ref_rand_augment")

    from PIL import Image

    aug_transform = ra.rand_augment_transform(
        "rand-m7-n4-mstd0.5-inc1",
        {"translate_const": int(size * 0.45),
         "img_mean": (124, 116, 104)},
    )

    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, (t_frames, size, size, 3), dtype=np.uint8)

    random.seed(0)
    # Reference protocol (`kinetics.py::_aug_frame` -> utils.frames_aug):
    # every frame of the clip goes through the SAME sampled op chain
    # object (PIL Images in, PIL out), then back to uint8 arrays.
    t0 = time.perf_counter()
    for _ in range(n_clips):
        imgs = [Image.fromarray(f) for f in clip]
        imgs = [aug_transform(im) for im in imgs]
        out = np.stack([np.asarray(im) for im in imgs])
    dt_ra = (time.perf_counter() - t0) / n_clips * 1e3

    # RandomErasing on the torch path is tensor math; its numpy cost is a
    # couple of slice-fills per clip — measure a faithful stand-in.
    t0 = time.perf_counter()
    for _ in range(n_clips):
        o = out.astype(np.float32)
        for _f in range(t_frames):
            if rng.random() < 0.25:
                h = int(size * rng.uniform(0.1, 0.33))
                w = int(size * rng.uniform(0.1, 0.33))
                y = rng.integers(0, size - h)
                x = rng.integers(0, size - w)
                o[_f, y:y + h, x:x + w] = rng.normal(
                    0, 1, (h, w, 3)
                ).astype(np.float32)
    dt_re = (time.perf_counter() - t0) / n_clips * 1e3

    # PIL conversion overhead alone (uint8 <-> PIL round trip, no ops).
    t0 = time.perf_counter()
    for _ in range(n_clips):
        imgs = [Image.fromarray(f) for f in clip]
        np.stack([np.asarray(im) for im in imgs])
    dt_conv = (time.perf_counter() - t0) / n_clips * 1e3

    print(f"host RandAugment m7-n4 (ref PIL impl): {dt_ra:7.1f} ms/clip")
    print(f"host RandomErasing (numpy stand-in):   {dt_re:7.1f} ms/clip")
    print(f"PIL<->numpy conversion alone:          {dt_conv:7.1f} ms/clip")
    total = dt_ra + dt_re
    print(f"TOTAL host aug: {total:.1f} ms/clip/core")
    # r4 loader ledger: decode+crop 9.14 clips/s/core = 109.4 ms/clip.
    decode_ms = 109.4
    rate_with_aug = 1e3 / (decode_ms + total)
    print(
        f"loader rate with host aug: {rate_with_aug:.2f} clips/s/core "
        f"(was 9.14); 28-core host: {rate_with_aug * 28:.0f} clips/s "
        f"(was 256)"
    )


if __name__ == "__main__":
    main()
