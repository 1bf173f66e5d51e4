"""On-device SSL color augmentation vs stdlib/analytic references."""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.data import color_jitter as cj


def _img(b=2, t=2, h=4, w=5, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 256, (b, t, h, w, 3)).astype(np.float32)
    )


def test_identity_factors():
    x = _img()
    ones = jnp.ones((2, 1, 1, 1, 1))
    np.testing.assert_allclose(cj.adjust_brightness(x, ones), x, atol=1e-4)
    np.testing.assert_allclose(cj.adjust_contrast(x, ones), x, atol=1e-3)
    np.testing.assert_allclose(cj.adjust_saturation(x, ones), x, atol=1e-3)
    np.testing.assert_allclose(
        cj.adjust_hue(x, jnp.zeros((2, 1, 1, 1))), x, atol=0.51
    )


def test_adjust_hue_matches_colorsys():
    x = _img(b=1, t=1, h=3, w=3, seed=1)
    delta = 0.23
    out = np.asarray(cj.adjust_hue(x, jnp.full((1, 1, 1, 1), delta)))
    flat_in = np.asarray(x).reshape(-1, 3) / 255.0
    flat_out = out.reshape(-1, 3) / 255.0
    for pin, pout in zip(flat_in, flat_out):
        h, s, v = colorsys.rgb_to_hsv(*pin)
        expected = colorsys.hsv_to_rgb((h + delta) % 1.0, s, v)
        np.testing.assert_allclose(pout, expected, atol=2e-3)


def test_brightness_scales():
    x = _img()
    f = jnp.full((2, 1, 1, 1, 1), 0.5)
    np.testing.assert_allclose(
        cj.adjust_brightness(x, f), np.asarray(x) * 0.5, atol=1e-4
    )


def test_contrast_zero_gives_mean_gray():
    x = _img()
    out = cj.adjust_contrast(x, jnp.zeros((2, 1, 1, 1, 1)))
    # factor 0 -> every pixel is the per-sample mean of the grayscale image.
    gray = np.asarray(cj.rgb_to_grayscale(x))
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(out)[i], np.clip(gray[i].mean(), 0, 255), atol=1e-2
        )


def test_saturation_zero_is_grayscale():
    x = _img()
    out = np.asarray(cj.adjust_saturation(x, jnp.zeros((2, 1, 1, 1, 1))))
    assert np.allclose(out[..., 0], out[..., 1], atol=1e-3)
    assert np.allclose(out[..., 1], out[..., 2], atol=1e-3)


def test_random_grayscale_prob():
    x = _img(b=8)
    out0 = np.asarray(cj.random_grayscale(jax.random.PRNGKey(0), x, 0.0))
    np.testing.assert_allclose(out0, x)
    out1 = np.asarray(cj.random_grayscale(jax.random.PRNGKey(0), x, 1.0))
    assert np.allclose(out1[..., 0], out1[..., 2], atol=1e-3)


def test_gaussian_blur_preserves_mean_and_smooths():
    x = _img(b=2, t=1, h=16, w=16, seed=2)
    out = np.asarray(
        cj.gaussian_blur(jax.random.PRNGKey(0), x, sigma_min=1.5, sigma_max=1.5)
    )
    # Edge-padded blur preserves the global mean approximately and reduces
    # variance substantially.
    assert abs(out.mean() - np.asarray(x).mean()) < 8.0
    assert out.var() < np.asarray(x).var() * 0.7


def test_temporal_difference_matches_reference_math():
    x = _img(b=1, t=4, h=2, w=2, seed=3)
    out = np.asarray(cj.temporal_difference(x, use_grayscale=False))
    xn = np.asarray(x)
    np.testing.assert_allclose(out[:, :3], xn[:, :3] - xn[:, 1:], atol=1e-4)
    np.testing.assert_allclose(out[:, 3], xn[:, 2] - xn[:, 3], atol=1e-4)


def test_color_jitter_shapes_and_range():
    x = _img(b=4)
    out = np.asarray(cj.color_jitter(jax.random.PRNGKey(0), x))
    assert out.shape == x.shape
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_ssl_color_jitter_both_modes_jit():
    x = _img(b=4)
    for moco in (False, True):
        f = jax.jit(
            lambda k, y: cj.ssl_color_jitter(
                k, y, p_convert_gray=0.2, moco_v2_aug=moco
            )
        )
        out = np.asarray(f(jax.random.PRNGKey(1), x))
        assert out.shape == x.shape
        assert np.isfinite(out).all()


def test_preprocess_fn_with_ssl_jitter():
    from pmv_tpu.config import get_cfg
    from pmv_tpu.engine.steps import make_preprocess_fn

    cfg = get_cfg()
    cfg.DATA.SSL_COLOR_JITTER = True
    cfg.DATA.SSL_MOCOV2_AUG = True
    cfg.DATA.COLOR_RND_GRAYSCALE = 0.2
    cfg.DATA.TIME_DIFF_PROB = 0.5
    pre = make_preprocess_fn(cfg, train=True)
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 2, 8, 8, 3), np.uint8)
    )
    out = jax.jit(pre)(jax.random.PRNGKey(0), frames)
    assert out.shape == frames.shape
    assert np.isfinite(np.asarray(out)).all()


def test_lighting_jitter_mean_shift():
    """PCA lighting: zero alphastd is identity; per-sample channel offset."""
    x = _img(b=3)
    eigval = [0.225, 0.224, 0.229]
    eigvec = [
        [-0.5675, 0.7192, 0.4009],
        [-0.5808, -0.0045, -0.8140],
        [-0.5836, -0.6948, 0.4203],
    ]
    out0 = cj.lighting_jitter(jax.random.PRNGKey(0), x, 0.0, eigval, eigvec)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x))
    out = np.asarray(
        cj.lighting_jitter(jax.random.PRNGKey(0), x, 0.1, eigval, eigvec)
    )
    # A constant per-(sample, channel) offset: variance unchanged per channel.
    d = out - np.asarray(x)
    for b in range(3):
        for c in range(3):
            assert d[b, ..., c].std() < 1e-3


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
import pytest  # noqa: E402  (slow-mark only)
pytestmark = pytest.mark.slow
