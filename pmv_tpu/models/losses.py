"""Loss functions (`MViT/slowfast/models/losses.py:65-87`)."""

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, reduction="mean"):
    """labels: int class ids."""
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return losses.mean() if reduction == "mean" else losses


def soft_cross_entropy(logits, soft_targets, reduction="mean", normalize_targets=False):
    """Soft-target CE (pytorchvideo SoftTargetCrossEntropyLoss used by mixup)."""
    if normalize_targets:
        soft_targets = soft_targets / jnp.clip(
            soft_targets.sum(axis=-1, keepdims=True), 1e-8
        )
    losses = -(soft_targets * jax.nn.log_softmax(logits, axis=-1)).sum(axis=-1)
    return losses.mean() if reduction == "mean" else losses


def bce(preds, labels, reduction="mean"):
    losses = -(
        labels * jnp.log(jnp.clip(preds, 1e-8, 1.0))
        + (1 - labels) * jnp.log(jnp.clip(1 - preds, 1e-8, 1.0))
    )
    return losses.mean() if reduction == "mean" else losses


def bce_logit(logits, labels, reduction="mean"):
    losses = optax.sigmoid_binary_cross_entropy(logits, labels)
    return losses.mean() if reduction == "mean" else losses


def mse(preds, targets, reduction="mean"):
    losses = (preds - targets) ** 2
    return losses.mean() if reduction == "mean" else losses


_LOSSES = {
    "cross_entropy": cross_entropy,
    "soft_cross_entropy": soft_cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
    "mse": mse,
}


def get_loss_func(loss_name):
    if loss_name not in _LOSSES:
        raise NotImplementedError(f"Loss {loss_name} is not supported")
    return _LOSSES[loss_name]
