"""RoIAlign on channels-last feature maps.

JAX equivalent of detectron2's ROIAlign as used by the reference detection
heads (`head_helper.py` ResNetRoIHead). Bilinear sampling at a fixed
sampling grid per output bin; `aligned=True` applies the -0.5 half-pixel
offset (detectron2 semantics). Static shapes: boxes are a fixed-size padded
array with a validity mask handled by the caller.
"""

import jax
import jax.numpy as jnp


def roi_align(
    features, boxes, box_batch_idx, output_size, spatial_scale=1.0,
    sampling_ratio=2, aligned=True,
):
    """features: [B, H, W, C]; boxes: [N, 4] (x1, y1, x2, y2) in input
    coordinates; box_batch_idx: [N] int; returns [N, out_h, out_w, C]."""
    out_h, out_w = output_size
    b, h, w, c = features.shape
    n = boxes.shape[0]

    boxes = boxes.astype(jnp.float32) * spatial_scale
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] - offset
    y1 = boxes[:, 1] - offset
    x2 = boxes[:, 2] - offset
    y2 = boxes[:, 3] - offset
    roi_w = jnp.maximum(x2 - x1, 1.0 if not aligned else 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1.0 if not aligned else 1e-6)

    bin_w = roi_w / out_w
    bin_h = roi_h / out_h
    s = sampling_ratio

    # Sample points: per output bin, an s x s grid.
    iy = (jnp.arange(out_h * s) + 0.5) / s  # in bin-h units
    ix = (jnp.arange(out_w * s) + 0.5) / s
    # [N, out_h*s] absolute y coords; same for x.
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]

    def bilinear(feat, ys_r, xs_r):
        """feat [H, W, C]; sample at outer product of ys_r, xs_r."""
        y0 = jnp.clip(jnp.floor(ys_r), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs_r), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        wy = jnp.clip(ys_r, 0, h - 1) - y0
        wx = jnp.clip(xs_r, 0, w - 1) - x0
        f00 = feat[y0i][:, x0i]  # [Y, X, C]
        f01 = feat[y0i][:, x1i]
        f10 = feat[y1i][:, x0i]
        f11 = feat[y1i][:, x1i]
        wy = wy[:, None, None]
        wx = wx[None, :, None]
        return (
            f00 * (1 - wy) * (1 - wx)
            + f01 * (1 - wy) * wx
            + f10 * wy * (1 - wx)
            + f11 * wy * wx
        )

    def sample_one(box_i):
        feat = features[box_batch_idx[box_i]]
        grid = bilinear(feat, ys[box_i], xs[box_i])  # [out_h*s, out_w*s, C]
        grid = grid.reshape(out_h, s, out_w, s, c)
        return grid.mean(axis=(1, 3))

    return jax.vmap(sample_one)(jnp.arange(n))
