"""Grad-CAM localization maps (`MViT/slowfast/visualization/gradcam_utils.py`).

JAX-native re-design: the reference registers forward/backward hooks on a
target conv layer; here the models insert a zero-valued flax `perturb` tap
("features") right before their heads, and Grad-CAM is one `jax.grad` with
respect to that perturbation — the functional equivalent of a backward hook,
with no mutable state.
"""

import jax
import jax.numpy as jnp
import numpy as np


def gradcam(model, variables, frames, target_labels=None):
    """Grad-CAM for any model with a `features` perturb tap.

    frames: [B, ...] normalized input.
    Returns (maps [B, T', H', W'] in [0, 1], preds [B, C]).
    """
    # Initialize the perturbation collection (zeros shaped like features).
    _, pert_vars = model.apply(
        {"params": variables["params"], **_stats(variables)},
        frames, train=False,
        mutable=["perturbations"],
    )
    zero_pert = pert_vars["perturbations"]

    def score_fn(pert):
        preds = model.apply(
            {
                "params": variables["params"],
                **_stats(variables),
                "perturbations": pert,
            },
            frames, train=False,
        )
        tl = (
            jnp.argmax(jax.lax.stop_gradient(preds), axis=-1)
            if target_labels is None
            else target_labels
        )
        score = jnp.sum(jnp.take_along_axis(preds, tl[:, None], axis=1))
        return score, preds

    grads, preds = jax.grad(score_fn, has_aux=True)(zero_pert)
    feats = _features_from_tap(model, variables, frames)
    g = list(jax.tree_util.tree_leaves(grads))[0]

    if feats.ndim == 3:
        # Token features [B, N, C] (transformers): channel weights from the
        # grad, ReLU'd weighted sum over channels -> per-token map.
        weights = jnp.mean(g, axis=1, keepdims=True)  # [B, 1, C]
        cam = jnp.maximum(jnp.sum(weights * feats, axis=-1), 0.0)  # [B, N]
    else:
        # Grid features [B, T, H, W, C] (convnets).
        weights = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
        cam = jnp.maximum(jnp.sum(weights * feats, axis=-1), 0.0)
    flat = cam.reshape(cam.shape[0], -1)
    mn = flat.min(axis=1, keepdims=True)
    mx = flat.max(axis=1, keepdims=True)
    cam = ((flat - mn) / (mx - mn + 1e-8)).reshape(cam.shape)
    return np.asarray(cam), np.asarray(preds)


def _stats(variables):
    return (
        {"batch_stats": variables["batch_stats"]}
        if variables.get("batch_stats")
        else {}
    )


def _features_from_tap(model, variables, frames):
    out = model.apply(
        {"params": variables["params"], **_stats(variables)},
        frames, train=False, return_features=True,
    )
    return out[0] if isinstance(out, tuple) else out


def overlay_heatmap(frame, cam_2d, alpha=0.5):
    """Blend a [h, w] cam onto a [H, W, 3] uint8 frame (jet colormap)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm
    from PIL import Image

    h, w = frame.shape[:2]
    cam_img = Image.fromarray((np.asarray(cam_2d) * 255).astype(np.uint8))
    cam_img = cam_img.resize((w, h), Image.BILINEAR)
    heat = cm.jet(np.asarray(cam_img) / 255.0)[..., :3] * 255
    out = (1 - alpha) * frame.astype(np.float32) + alpha * heat
    return np.clip(out, 0, 255).astype(np.uint8)
