"""On-device RandAugment.

JAX re-design of the timm RandAugment port used by the reference
(`MViT/slowfast/datasets/rand_augment.py`, applied per-frame through a PIL
roundtrip at `kinetics.py:429-440`). Here the whole op set runs on-device in
the jitted preprocessing graph: no PIL, no host roundtrip, every frame of a
clip gets the same sampled ops/magnitudes (temporally consistent, matching
the reference's per-clip application).

Value convention: float32 images in [0, 255], channels-last [T, H, W, C].

Parity notes (training-only augmentation; distributional equivalence is the
goal, not bit parity): geometric ops use bilinear sampling (timm randomly
picks bilinear/bicubic); equalize follows PIL's integer LUT algorithm.
"""

import math
import re

import jax
import jax.numpy as jnp

_LEVEL_DENOM = 10.0
_FILL = 128.0


def _einsum_f32(spec, a, b):
    """einsum with f32 accumulation. On TPU the MXU accumulates f32 from
    bf16 operands for free (preferred_element_type); the CPU backend cannot
    execute a bf16 x bf16 -> f32 dot at the tests' low optimization level,
    so inputs are upcast there instead."""
    if jax.default_backend() == "tpu":
        return jnp.einsum(spec, a, b, preferred_element_type=jnp.float32)
    return jnp.einsum(spec, a.astype(jnp.float32), b.astype(jnp.float32))


# --------------------------------------------------------------- affine warp
def _resample_x(img, src_x):
    """1-D bilinear resample along W: out[t,h,x,c] = img[t,h,src_x[h,x],c].

    TPU idiom: the per-row gather becomes a banded interpolation matrix and
    one MXU einsum (gathers with 2-D index grids are the slow path on TPU —
    measured ~10x slower for this op). Out-of-range samples blend toward
    _FILL via the weight-sum deficit, matching the gather path's masking.
    src_x: [H, W_out] source positions (may be fractional / out of range).
    """
    t, h, w, c = img.shape
    u = jnp.arange(w, dtype=jnp.float32)
    wmat = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_x[:, None, :] - u[None, :, None])
    )  # [H, W_in, W_out]
    deficit = 1.0 - jnp.sum(wmat, axis=1)  # [H, W_out]
    # Band matrix in the image dtype: at bf16 preprocess this halves the
    # 45 MB (224^3 f32) weight tensor's traffic; accumulation stays f32.
    out = _einsum_f32("thuc,hux->thxc", img, wmat.astype(img.dtype))
    return (out + deficit[None, :, :, None] * _FILL).astype(img.dtype)


def _resample_y(img, src_y):
    """1-D bilinear resample along H: out[t,y,x,c] = img[t,src_y[y,x],x,c].

    src_y: [H_out, W] source positions.
    """
    t, h, w, c = img.shape
    v = jnp.arange(h, dtype=jnp.float32)
    wmat = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_y.T[:, None, :] - v[None, :, None])
    )  # wmat[x, v, y] = bilinear weight of input row v for output (y, x)
    deficit = 1.0 - jnp.sum(wmat, axis=1)  # [W, H_out]
    out = _einsum_f32("tvxc,xvy->tyxc", img, wmat.astype(img.dtype))
    return (out + deficit.T[None, :, :, None] * _FILL).astype(img.dtype)


def _resample_x_const(img, src_x_row):
    """_resample_x when every row shares the same source positions
    (translate): one [W_in, W_out] band matrix instead of [H, W_in, W_out]
    — 224x less weight traffic and a single clean matmul."""
    t, h, w, c = img.shape
    u = jnp.arange(w, dtype=jnp.float32)
    wmat = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_x_row[None, :] - u[:, None])
    )  # [W_in, W_out]
    deficit = 1.0 - jnp.sum(wmat, axis=0)  # [W_out]
    out = _einsum_f32("thuc,ux->thxc", img, wmat.astype(img.dtype))
    return (out + deficit[None, None, :, None] * _FILL).astype(img.dtype)


def _resample_y_const(img, src_y_col):
    """_resample_y when every column shares the same source positions."""
    t, h, w, c = img.shape
    v = jnp.arange(h, dtype=jnp.float32)
    wmat = jnp.maximum(
        0.0, 1.0 - jnp.abs(src_y_col[None, :] - v[:, None])
    )  # [H_in, H_out]
    deficit = 1.0 - jnp.sum(wmat, axis=0)  # [H_out]
    out = _einsum_f32("tvxc,vy->tyxc", img, wmat.astype(img.dtype))
    return (out + deficit[None, :, None, None] * _FILL).astype(img.dtype)


def _grid(h, w):
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    return jnp.meshgrid(xs, ys)  # X, Y each [H, W]


def _affine(img, matrix):
    """Apply inverse-mapping 2x3 affine (PIL convention): out(x,y) = in(a x + b y + c, d x + e y + f).

    img: [T, H, W, C]; bilinear sampling, out-of-bounds filled with _FILL.
    """
    t, h, w, c = img.shape
    a, b, cc, d, e, f = matrix
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, ys)  # [H, W]
    src_x = a * X + b * Y + cc
    src_y = d * X + e * Y + f

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img[:, yi_c, xi_c, :]  # [T, H, W, C]
        return jnp.where(valid[None, :, :, None], vals, _FILL)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[None, :, :, None]
    fy = fy[None, :, :, None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out


def _rotate(img, degrees):
    """Rotation about center as a Paeth 3-shear (x, y, x) chain.

    Each shear is one banded-matmul resample, so the rotation runs on the
    MXU instead of per-pixel gathers. Centered decomposition of the inverse
    map src = R (out - ctr) + ctr with R = [[cos, sin], [-sin, cos]]:
    alpha = tan(theta/2) (both x-shears), beta = -sin(theta). Interpolation
    is applied per pass (slightly softer than PIL's single-pass bilinear —
    training-only augmentation, distributional equivalence).
    """
    t, h, w, c = img.shape
    angle = -degrees * math.pi / 180.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    alpha = jnp.tan(angle / 2.0)
    beta = -jnp.sin(angle)
    X, Y = _grid(h, w)
    src_x = X + alpha * (Y - cy)  # [H, W]
    src_y = Y + beta * (X - cx)
    img = _resample_x(img, src_x)
    img = _resample_y(img, src_y)
    return _resample_x(img, src_x)


def _shear_x(img, factor):
    t, h, w, c = img.shape
    X, Y = _grid(h, w)
    return _resample_x(img, X + factor * Y)


def _shear_y(img, factor):
    t, h, w, c = img.shape
    X, Y = _grid(h, w)
    return _resample_y(img, Y + factor * X)


def _translate_x(img, pixels):
    t, h, w, c = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    return _resample_x_const(img, xs + pixels)


def _translate_y(img, pixels):
    t, h, w, c = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    return _resample_y_const(img, ys + pixels)


# --------------------------------------------------------------- color ops
def _blend(img, degenerate, factor):
    return jnp.clip(degenerate + factor * (img - degenerate), 0.0, 255.0)


def _grayscale(img):
    l = (
        img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    )
    return jnp.repeat(l[..., None], img.shape[-1], axis=-1)


def _color(img, factor):
    return _blend(img, jnp.round(_grayscale(img)), factor)


def _contrast(img, factor):
    mean = jnp.mean(jnp.round(_grayscale(img)))
    return _blend(img, mean, factor)


def _brightness(img, factor):
    return _blend(img, 0.0, factor)


def _sharpness(img, factor):
    kernel = jnp.array(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], img.dtype
    ) / 13.0
    t, h, w, c = img.shape
    x = jnp.moveaxis(img, -1, 1).reshape(t * c, 1, h, w)
    smoothed = jax.lax.conv_general_dilated(
        x, kernel[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    smoothed = jnp.moveaxis(smoothed.reshape(t, c, h, w), 1, -1)
    # PIL keeps the 1-pixel border unchanged.
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    degenerate = jnp.where(border[None, :, :, None], smoothed, img)
    return _blend(img, degenerate, factor)


def _invert(img, _):
    return 255.0 - img


def _autocontrast(img, _):
    # Per-frame per-channel min/max rescale (PIL autocontrast, cutoff=0).
    lo = jnp.min(img, axis=(1, 2), keepdims=True)
    hi = jnp.max(img, axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
    offset = jnp.where(hi > lo, -lo * scale, 0.0)
    return jnp.clip(img * scale + offset, 0.0, 255.0)


def _equalize(img, _):
    """PIL ImageOps.equalize integer-LUT algorithm, per frame and channel.

    TPU note: scatter histograms and table-lookup gathers are slow on TPU;
    both are expressed as compare-reduce + matmul against the 256-bin
    one-hot matrix, processed frame-by-frame (lax.map) to bound memory.
    """
    t, h, w, c = img.shape
    # Channel-planar [T, C, N]: the compare-reduces run with the pixel
    # axis in lanes (channels-last C=3 uses 3/128 lanes — measured 3x
    # slower for this op on v5e).
    flat = jnp.round(
        jnp.moveaxis(img, 3, 1).astype(jnp.float32)
    ).reshape(t, c, h * w)

    # Two-level histogram: value = 16*hi + lo with hi, lo in [0, 16).
    # A flat 256-bin compare costs 256*N VPU compares (plus the same
    # again for the LUT application); factored, it is 32*N compares and
    # two [16,16]xN matmuls on the MXU — ~8x less VPU work for the most
    # expensive RandAugment op. 0/1 operands and counts < 2^24 are exact
    # in bf16-in/f32-accumulate matmuls.
    b16 = jnp.arange(16, dtype=jnp.float32)
    hi = jnp.floor(flat / 16.0)
    lo = flat - hi * 16.0
    oh_hi = (hi[:, :, None, :] == b16[None, None, :, None]).astype(
        jnp.bfloat16
    )  # [T, C, 16, N]
    oh_lo = (lo[:, :, None, :] == b16[None, None, :, None]).astype(
        jnp.bfloat16
    )
    hist2d = _einsum_f32("tchn,tcfn->tchf", oh_hi, oh_lo)  # [T, C, 16, 16] exact counts
    hist = hist2d.reshape(t, c, 256).astype(jnp.int32)  # [T, C, 256]
    nonzero = hist > 0
    last_idx = 255 - jnp.argmax(nonzero[..., ::-1], axis=-1)  # [T, C]
    last_count = jnp.take_along_axis(hist, last_idx[..., None], axis=-1)[
        ..., 0
    ]
    step = (jnp.sum(hist, axis=-1) - last_count) // 255  # [T, C]
    cumsum = jnp.cumsum(hist, axis=-1)
    shifted = jnp.concatenate(
        [jnp.zeros((t, c, 1), jnp.int32), cumsum[..., :-1]], axis=-1
    )
    lut = (step[..., None] // 2 + shifted) // jnp.maximum(
        step[..., None], 1
    )
    lut = jnp.clip(lut, 0, 255)
    identity = jnp.broadcast_to(
        jnp.arange(256, dtype=jnp.int32), (t, c, 256)
    )
    lut = jnp.where(step[..., None] == 0, identity, lut)  # [T, C, 256]
    # LUT application through the same factorization: out[n] =
    # sum_h oh_hi[h,n] * (lut2d[h,:] @ oh_lo[:,n]). LUT values <= 255 are
    # exact in bf16 (8 significant bits).
    lut2d = lut.reshape(t, c, 16, 16).astype(jnp.bfloat16)
    mixed = _einsum_f32("tchf,tcfn->tchn", lut2d, oh_lo)  # [T, C, 16, N]
    out = jnp.sum(oh_hi.astype(jnp.float32) * mixed, axis=2)  # [T, C, N]
    return jnp.moveaxis(out.reshape(t, c, h, w), 1, 3).astype(img.dtype)


def _posterize(img, bits):
    # Keep `bits` high bits. bits is traced; build mask arithmetically.
    bits = jnp.clip(bits, 0, 8).astype(jnp.int32)
    shift = 8 - bits
    vals = jnp.round(img).astype(jnp.int32)
    out = jnp.left_shift(jnp.right_shift(vals, shift), shift)
    return out.astype(img.dtype)


def _solarize(img, thresh):
    return jnp.where(img >= thresh, 255.0 - img, img)


def _solarize_add(img, add):
    return jnp.where(img < 128.0, jnp.clip(img + add, 0.0, 255.0), img)


# ------------------------------------------------------- magnitude -> arg
def _randomly_negate(key, v):
    return jnp.where(jax.random.uniform(key) < 0.5, -v, v)


def _make_ops(hparams):
    """(name, fn, level_fn) table — timm's `rand-...-inc1` increasing set."""
    translate_pct = hparams.get("translate_pct", 0.45)

    def lvl_rotate(key, m):
        return _randomly_negate(key, m / _LEVEL_DENOM * 30.0)

    def lvl_shear(key, m):
        return _randomly_negate(key, m / _LEVEL_DENOM * 0.3)

    def lvl_enhance_inc(key, m):
        return 1.0 + _randomly_negate(key, m / _LEVEL_DENOM * 0.9)

    def lvl_posterize_inc(key, m):
        return 4 - jnp.round(m / _LEVEL_DENOM * 4).astype(jnp.int32)

    def lvl_solarize_inc(key, m):
        return 256.0 - jnp.round(m / _LEVEL_DENOM * 256)

    def lvl_solarize_add(key, m):
        return jnp.round(m / _LEVEL_DENOM * 110)

    def lvl_none(key, m):
        return jnp.float32(0.0)

    return [
        ("AutoContrast", _autocontrast, lvl_none),
        ("Equalize", _equalize, lvl_none),
        ("Invert", _invert, lvl_none),
        ("Rotate", _rotate, lvl_rotate),
        ("Posterize", _posterize, lvl_posterize_inc),
        ("Solarize", _solarize, lvl_solarize_inc),
        ("SolarizeAdd", _solarize_add, lvl_solarize_add),
        ("Color", _color, lvl_enhance_inc),
        ("Contrast", _contrast, lvl_enhance_inc),
        ("Brightness", _brightness, lvl_enhance_inc),
        ("Sharpness", _sharpness, lvl_enhance_inc),
        ("ShearX", _shear_x, lvl_shear),
        ("ShearY", _shear_y, lvl_shear),
        (
            "TranslateX",
            lambda img, v: _translate_x(img, v),
            lambda key, m: _randomly_negate(key, m / _LEVEL_DENOM * translate_pct)
        ),
        (
            "TranslateY",
            lambda img, v: _translate_y(img, v),
            lambda key, m: _randomly_negate(key, m / _LEVEL_DENOM * translate_pct)
        ),
    ]


def parse_rand_augment_config(config_str):
    """Parse 'rand-m7-n4-mstd0.5-inc1' (timm syntax) -> dict."""
    parts = config_str.split("-")
    assert parts[0] == "rand", f"not a rand-augment config: {config_str}"
    out = {"magnitude": 9, "num_layers": 2, "magnitude_std": 0.0, "increasing": False}
    for p in parts[1:]:
        m = re.match(r"([a-z]+)([0-9.]+)", p)
        if m is None:
            continue
        key, val = m.group(1), float(m.group(2))
        if key == "m":
            out["magnitude"] = val
        elif key == "n":
            out["num_layers"] = int(val)
        elif key == "mstd":
            out["magnitude_std"] = val
        elif key == "inc":
            out["increasing"] = bool(val)
        elif key == "p":
            out["prob"] = val
    return out


class RandAugment:
    """Jit-friendly RandAugment: n ops sampled per clip, applied in sequence."""

    def __init__(self, config_str="rand-m9-n2-mstd0.5", hparams=None):
        cfg = parse_rand_augment_config(config_str)
        self.magnitude = cfg["magnitude"]
        self.num_layers = cfg["num_layers"]
        self.magnitude_std = cfg["magnitude_std"]
        self.ops = _make_ops(hparams or {})

    def __call__(self, key, img):
        """img: [T, H, W, C] float32 in [0, 255]."""
        num_ops = len(self.ops)

        def apply_one(carry_img, layer_key):
            k_choice, k_mag, k_sign = jax.random.split(layer_key, 3)
            op_idx = jax.random.randint(k_choice, (), 0, num_ops)
            m = self.magnitude
            if self.magnitude_std > 0:
                m = m + self.magnitude_std * jax.random.normal(k_mag)
            m = jnp.clip(m, 0.0, _LEVEL_DENOM)

            branches = []
            for name, fn, lvl_fn in self.ops:
                def branch(img_, fn=fn, lvl_fn=lvl_fn):
                    return fn(img_, lvl_fn(k_sign, m)).astype(img_.dtype)

                branches.append(branch)
            out = jax.lax.switch(op_idx, branches, carry_img)
            return out, None

        layer_keys = jax.random.split(key, self.num_layers)
        for i in range(self.num_layers):
            img, _ = apply_one(img, layer_keys[i])
        return img

    def apply_batch(self, key, x, groups=2):
        """Batch-level RandAugment: x [B, T, H, W, C].

        TPU note: vmapping the per-sample op `switch` makes XLA execute every
        branch for every sample (batched predicates) — measured 2.4 s/step
        for MViTv2-S. Here the batch is split into `groups` chunks and each
        layer draws ONE op (+ magnitude/sign) per chunk: total elementwise
        work equals `num_layers` full-batch ops regardless of `groups`, so
        diversity is (almost) free. Per-sample independence of the
        reference's CPU RandAugment is approximated; diversity across
        steps/groups is preserved (documented deviation).
        """
        b = x.shape[0]
        groups = max(1, min(groups, b))
        while b % groups:
            groups -= 1

        def apply_group(key_g, xg):
            bg, t, h, w, c = xg.shape
            flat = xg.reshape(bg * t, h, w, c)

            def apply_one(carry_img, layer_key):
                k_choice, k_mag, k_sign = jax.random.split(layer_key, 3)
                op_idx = jax.random.randint(k_choice, (), 0, len(self.ops))
                m = self.magnitude
                if self.magnitude_std > 0:
                    m = m + self.magnitude_std * jax.random.normal(k_mag)
                m = jnp.clip(m, 0.0, _LEVEL_DENOM)
                branches = []
                for name, fn, lvl_fn in self.ops:
                    def branch(img_, fn=fn, lvl_fn=lvl_fn):
                        return fn(img_, lvl_fn(k_sign, m)).astype(img_.dtype)

                    branches.append(branch)
                return jax.lax.switch(op_idx, branches, carry_img), None

            # Unrolled: num_layers is small and static, and loop constructs
            # carry a measured ~1.6 ms/iteration overhead on the TPU
            # runtime here — unrolling keeps the graph flat.
            layer_keys = jax.random.split(key_g, self.num_layers)
            for i in range(self.num_layers):
                flat, _ = apply_one(flat, layer_keys[i])
            return flat.reshape(bg, t, h, w, c)

        keys = jax.random.split(key, groups)
        chunk = b // groups
        outs = [
            apply_group(keys[g], x[g * chunk : (g + 1) * chunk])
            for g in range(groups)
        ]
        return jnp.concatenate(outs, axis=0)
