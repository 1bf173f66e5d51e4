"""Accuracy / error metrics.

Equivalent surface to `MViT/slowfast/utils/metrics.py` (topks_correct,
topk_errors, topk_accuracies) implemented on jax/numpy arrays.
"""

import jax.numpy as jnp


def topks_correct(preds, labels, ks):
    """Number of top-k correct predictions for each k.

    Args:
        preds: [N, C] score array (jax or numpy).
        labels: [N] int labels.
        ks: list of k values.
    Returns:
        list of scalars (same backend as inputs), one per k.
    """
    assert preds.shape[0] == labels.shape[0]
    max_k = int(max(ks))
    # [N, max_k] indices of the top max_k scores per row.
    top_inds = jnp.argsort(preds, axis=1)[:, ::-1][:, :max_k]
    correct = top_inds == labels[:, None]  # [N, max_k]
    return [jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in ks]


def topk_errors(preds, labels, ks):
    """Top-k error percentage for each k."""
    num_correct = topks_correct(preds, labels, ks)
    return [(1.0 - x / preds.shape[0]) * 100.0 for x in num_correct]


def topk_accuracies(preds, labels, ks):
    """Top-k accuracy percentage for each k."""
    num_correct = topks_correct(preds, labels, ks)
    return [(x / preds.shape[0]) * 100.0 for x in num_correct]
