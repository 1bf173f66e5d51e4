"""On-device SSL color augmentation (contrastive pretraining recipes).

TPU-first re-design of `MViT/slowfast/datasets/transform.py:1263-1390`
(`color_jitter_video_ssl`, `temporal_difference`, `augment_raw_frames`,
`GaussianBlur`): the reference runs torchvision/PIL per clip in CPU worker
processes; here the same math runs inside the jitted train step on the
already-batched uint8 clips, with per-sample randomness from the step key.

Conventions: x is float [B, T, H, W, C] in [0, 255]; every adjust_* matches
torchvision.transforms.functional on that domain (blend + clamp). One
deliberate deviation: the reference PIL-blurs the clip flattened to
(C, T*H, W) — blurring *across frame boundaries*; here the blur is a true
per-frame 2-D gaussian.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_GRAY_W = (0.299, 0.587, 0.114)  # ITU-R 601, torchvision rgb_to_grayscale


def rgb_to_grayscale(x):
    """[..., 3] -> [..., 1] luminance (torchvision weights)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return (_GRAY_W[0] * r + _GRAY_W[1] * g + _GRAY_W[2] * b)[..., None]


def _blend(img1, img2, factor):
    return jnp.clip(factor * img1 + (1.0 - factor) * img2, 0.0, 255.0)


def adjust_brightness(x, factor):
    return _blend(x, jnp.zeros_like(x), factor)


def adjust_contrast(x, factor):
    # Blend with the mean of the grayscale image (per sample: reduce over
    # every axis except the leading batch axes carried by `factor`).
    gray = rgb_to_grayscale(x)
    axes = tuple(range(x.ndim - 4, x.ndim))  # T, H, W, C of gray
    mean = jnp.mean(gray, axis=axes[:3] + (x.ndim - 1,), keepdims=True)
    return _blend(x, mean, factor)


def adjust_saturation(x, factor):
    return _blend(x, rgb_to_grayscale(x), factor)


def adjust_hue(x, delta):
    """Shift hue by delta (fraction of a full turn, torchvision semantics)."""
    x01 = x / 255.0
    r, g, b = x01[..., 0], x01[..., 1], x01[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    s = jnp.where(v > 0, c / jnp.maximum(v, 1e-12), 0.0)
    safe_c = jnp.maximum(c, 1e-12)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(c > 0, h, 0.0)

    h = (h + delta) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1) * 255.0


def color_jitter(key, x, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.1):
    """torchvision ColorJitter: per-sample factors, batch-level random op
    order (scalar lax.switch compiles one branch per path; a per-sample
    order would run all 24 permutations for every element)."""
    b = x.shape[0]
    k_b, k_c, k_s, k_h, k_o = jax.random.split(key, 5)
    shp = (b, 1, 1, 1, 1)
    f_b = jax.random.uniform(
        k_b, shp, minval=max(0.0, 1 - brightness), maxval=1 + brightness
    )
    f_c = jax.random.uniform(
        k_c, shp, minval=max(0.0, 1 - contrast), maxval=1 + contrast
    )
    f_s = jax.random.uniform(
        k_s, shp, minval=max(0.0, 1 - saturation), maxval=1 + saturation
    )
    d_h = jax.random.uniform(k_h, shp[:-1], minval=-hue, maxval=hue)

    ops = [
        lambda y: adjust_brightness(y, f_b),
        lambda y: adjust_contrast(y, f_c),
        lambda y: adjust_saturation(y, f_s),
        lambda y: adjust_hue(y, d_h),
    ]
    perms = [
        (a, bb, c, d)
        for a in range(4) for bb in range(4) for c in range(4)
        for d in range(4)
        if len({a, bb, c, d}) == 4
    ]

    def chain(perm):
        def run(y):
            for idx in perm:
                y = ops[idx](y)
            return y
        return run

    order = jax.random.randint(k_o, (), 0, len(perms))
    return jax.lax.switch(order, [chain(p) for p in perms], x)


def random_grayscale(key, x, p):
    """Per-sample RandomGrayscale."""
    b = x.shape[0]
    gray = jnp.broadcast_to(rgb_to_grayscale(x), x.shape)
    take = jax.random.uniform(key, (b, 1, 1, 1, 1)) < p
    return jnp.where(take, gray, x)


def gaussian_blur(key, x, sigma_min=0.1, sigma_max=2.0, radius=5):
    """Per-sample-sigma separable 2-D gaussian blur (SimCLR aug)."""
    b = x.shape[0]
    sigma = jax.random.uniform(key, (b,), minval=sigma_min, maxval=sigma_max)
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k1 = jnp.exp(-(offs[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    k1 = k1 / jnp.sum(k1, axis=1, keepdims=True)  # [B, K]

    def blur_axis(y, axis):
        pad = [(0, 0)] * y.ndim
        pad[axis] = (radius, radius)
        yp = jnp.pad(y, pad, mode="edge")
        acc = jnp.zeros_like(y)
        for i in range(2 * radius + 1):
            sl = jax.lax.slice_in_dim(yp, i, i + y.shape[axis], axis=axis)
            acc = acc + sl * k1[:, i].reshape((b,) + (1,) * (y.ndim - 1))
        return acc

    return blur_axis(blur_axis(x, 2), 3)  # H then W


def lighting_jitter(key, x, alphastd, eigval, eigvec, scale=255.0):
    """AlexNet-style PCA lighting jitter (`transform.py:583-620`): one
    alpha draw per sample, per-channel offset rgb_c = sum_j eigvec[c,j] *
    alpha_j * eigval_j. `scale` adapts the reference's [0,1] domain to the
    on-device [0,255] pipeline."""
    if alphastd == 0:
        return x
    b = x.shape[0]
    alpha = alphastd * jax.random.normal(key, (b, 3))
    ev = jnp.asarray(eigval, jnp.float32)
    evec = jnp.asarray(eigvec, jnp.float32)
    rgb = jnp.einsum("cj,bj->bc", evec, alpha * ev[None, :]) * scale
    return x + rgb[:, None, None, None, :]


def temporal_difference(x, use_grayscale=True, absolute=False):
    """Frame differencing (`transform.py:1263-1287`): out[t] = x[t] - x[t+1],
    last frame repeats the previous difference."""
    if use_grayscale:
        x = jnp.broadcast_to(rgb_to_grayscale(x), x.shape)
    t = x.shape[1]
    dt = x[:, : t - 1] - x[:, 1:]
    if absolute:
        dt = jnp.abs(dt)
    if t <= 1:
        return jnp.zeros_like(x)
    return jnp.concatenate([dt, dt[:, -1:]], axis=1)


def augment_time_difference(key, x, prob):
    """`augment_raw_frames` time-diff branch, per-sample: replace the clip
    by (gray temporal difference + 255) / 2 with probability `prob`."""
    b = x.shape[0]
    td = (temporal_difference(x, use_grayscale=True) + 255.0) / 2.0
    take = jax.random.uniform(key, (b, 1, 1, 1, 1)) < prob
    return jnp.where(take, td, x)


def ssl_color_jitter(
    key,
    x,
    bri_con_sat=(0.4, 0.4, 0.4),
    hue=0.1,
    p_convert_gray=0.0,
    moco_v2_aug=False,
    blur_sigma=(0.1, 2.0),
):
    """`color_jitter_video_ssl` (`transform.py:1289-1338`) on device.

    moco_v2: RandomApply(jitter, .8) -> RandomGrayscale -> RandomApply(blur, .5)
    else:    RandomGrayscale -> jitter
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    b = x.shape[0]
    if moco_v2_aug:
        jittered = color_jitter(
            k1, x, bri_con_sat[0], bri_con_sat[1], bri_con_sat[2], hue
        )
        apply_j = jax.random.uniform(k2, (b, 1, 1, 1, 1)) < 0.8
        x = jnp.where(apply_j, jittered, x)
        x = random_grayscale(k3, x, p_convert_gray)
        blurred = gaussian_blur(k4, x, blur_sigma[0], blur_sigma[1])
        apply_b = jax.random.uniform(k5, (b, 1, 1, 1, 1)) < 0.5
        x = jnp.where(apply_b, blurred, x)
    else:
        x = random_grayscale(k3, x, p_convert_gray)
        x = color_jitter(
            k1, x, bri_con_sat[0], bri_con_sat[1], bri_con_sat[2], hue
        )
    return x
