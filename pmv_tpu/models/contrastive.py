"""Contrastive / self-supervised training (`MViT/slowfast/models/contrastive.py`).

TPU-first functional re-design of ContrastiveModel (MoCo, SimCLR, BYOL, SwAV,
memory bank):

- the momentum encoder is an EMA *parameter tree* carried in the SSL train
  state (the reference mutates a module copy in-place);
- the MoCo queue is a fixed-size device array + pointer in the state
  (`contrastive.py` queue ops), updated functionally each step;
- SimCLR needs no GatherLayer/AllGatherWithGradient
  (`distributed.py:264-306`): arrays are global under the mesh, so the
  z @ z_all^T logits already span the global batch and XLA inserts the
  collectives;
- SwAV's Sinkhorn runs a fixed iteration count inside jit.

Views: two device-side augmentations of each clip (the preprocessing graph
runs twice with independent PRNG keys).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pmv_tpu.models.build import MODEL_REGISTRY
from pmv_tpu.models.common import trunc_normal_init


class ProjectionMLP(nn.Module):
    """SSL projection head (`contrastive.py` MLP, BN-free variant)."""

    dim: int
    hidden: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(
                self.hidden, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name=f"fc{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.dim, dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name=f"fc{self.num_layers - 1}",
        )(x)
        return x


class PredictorMLP(nn.Module):
    """BYOL predictor (`contrastive.py` predictor stack)."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(x)
        x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x)


class ContrastiveEncoder(nn.Module):
    """Backbone (features) + projection (+ optional SwAV prototypes)."""

    cfg: Any
    hw_switch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        # Build the configured backbone headlessly via return_features.
        arch = cfg.MODEL.ARCH
        if arch == "mvit":
            from pmv_tpu.models.mvit import MViT

            feats = MViT(cfg=cfg, dtype=self.dtype, name="backbone")(
                x, train=train, return_features=True
            )[0].mean(axis=1)
        elif arch == "x3d":
            from pmv_tpu.models.x3d import X3D

            feats = X3D(cfg=cfg, dtype=self.dtype, name="backbone")(
                x, train=train, return_features=True
            ).mean(axis=(1, 2, 3))
        elif arch == "uniformer":
            from pmv_tpu.models.uniformer import Uniformer

            feats = Uniformer(cfg=cfg, dtype=self.dtype, name="backbone")(
                x, train=train, return_features=True
            ).mean(axis=(1, 2, 3))
        elif arch in ("slow", "c2d", "i3d", "2d"):
            # Slow-only ResNet backbone (the reference's contrastive recipes
            # use Slow R50, `configs/contrastive_ssl/*_SlowR50_8x8.yaml`).
            from pmv_tpu.models.resnet import ResNetModel

            feats = ResNetModel(cfg=cfg, dtype=self.dtype, name="backbone")(
                x, train=train, return_features=True
            ).mean(axis=(1, 2, 3))
        else:
            raise NotImplementedError(f"SSL backbone arch {arch}")

        z = ProjectionMLP(
            dim=cfg.CONTRASTIVE.DIM,
            hidden=cfg.CONTRASTIVE.MLP_DIM,
            num_layers=max(cfg.CONTRASTIVE.NUM_MLP_LAYERS, 1),
            dtype=self.dtype,
            name="projection",
        )(feats)
        z = z / (jnp.linalg.norm(z.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
        return z


# --------------------------------------------------------------------- losses
def moco_loss(q, k, queue, temperature):
    """InfoNCE with queue negatives (`contrastive.py` MoCo head)."""
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True)  # [B, 1]
    l_neg = q @ queue.T  # [B, K]
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return -jax.nn.log_softmax(logits, axis=1)[:, 0].mean()


def simclr_loss(z1, z2, temperature):
    """NT-Xent over the (global) batch (`contrastive.py` SimCLR)."""
    z = jnp.concatenate([z1, z2], axis=0)  # [2B, D]
    sim = z @ z.T / temperature
    n = z.shape[0]
    mask = jnp.eye(n, dtype=bool)
    sim = jnp.where(mask, -1e9, sim)
    b = z1.shape[0]
    targets = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    return -jnp.take_along_axis(
        jax.nn.log_softmax(sim, axis=1), targets[:, None], axis=1
    ).mean()


def byol_loss(p, z_target):
    """Normalized MSE (`contrastive.py` BYOL)."""
    p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
    z = z_target / (jnp.linalg.norm(z_target, axis=-1, keepdims=True) + 1e-8)
    return (2.0 - 2.0 * jnp.sum(p * z, axis=-1)).mean()


def sinkhorn(scores, n_iters=3, epsilon=0.05):
    """SwAV Sinkhorn-Knopp normalization, fixed iterations inside jit."""
    q = jnp.exp(scores / epsilon).T  # [K, B]
    q = q / jnp.sum(q)
    K, B = q.shape
    for _ in range(n_iters):
        q = q / jnp.sum(q, axis=1, keepdims=True) / K
        q = q / jnp.sum(q, axis=0, keepdims=True) / B
    return (q * B).T


def swav_loss(z1, z2, prototypes, temperature, sinkhorn_iters=3):
    """Swapped-prediction loss (`contrastive.py` SwAV)."""
    protos = prototypes / (
        jnp.linalg.norm(prototypes, axis=-1, keepdims=True) + 1e-8
    )
    s1 = z1 @ protos.T
    s2 = z2 @ protos.T
    q1 = jax.lax.stop_gradient(sinkhorn(s1, sinkhorn_iters))
    q2 = jax.lax.stop_gradient(sinkhorn(s2, sinkhorn_iters))
    p1 = jax.nn.log_softmax(s1 / temperature, axis=1)
    p2 = jax.nn.log_softmax(s2 / temperature, axis=1)
    return -0.5 * (jnp.sum(q2 * p1, axis=1) + jnp.sum(q1 * p2, axis=1)).mean()


def mem_bank_loss(q, bank, indices, temperature):
    """Memory-bank NCE ('mem' type): positives are the bank rows of the
    sample's own index."""
    pos = bank[indices]  # [B, D]
    l_pos = jnp.sum(q * pos, axis=-1, keepdims=True)
    l_neg = q @ bank.T
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return -jax.nn.log_softmax(logits, axis=1)[:, 0].mean()


# ------------------------------------------------------------- state helpers
def ema_update(online, momentum_tree, momentum):
    return jax.tree_util.tree_map(
        lambda m, o: m * momentum + o.astype(m.dtype) * (1.0 - momentum),
        momentum_tree, online,
    )


def queue_update(queue, ptr, keys):
    """Functional ring-buffer enqueue (`contrastive.py` queue update)."""
    b = keys.shape[0]
    k = queue.shape[0]
    idx = (ptr + jnp.arange(b)) % k
    queue = queue.at[idx].set(keys)
    return queue, (ptr + b) % k


def knn_predict(bank, bank_labels, feats, num_classes, k=200, temperature=0.07):
    """kNN classification from the memory bank (`contrastive.py` KNN eval):
    cosine-similarity top-k vote with temperature-weighted contributions."""
    sim = feats @ bank.T  # [B, N] (both sides L2-normalized)
    topv, topi = jax.lax.top_k(sim, k)
    weights = jnp.exp(topv / temperature)  # [B, k]
    votes = jax.nn.one_hot(bank_labels[topi], num_classes)  # [B, k, C]
    scores = jnp.sum(weights[..., None] * votes, axis=1)
    return scores


def bank_update(bank, indices, feats, momentum=0.5):
    old = bank[indices]
    new = old * momentum + feats * (1 - momentum)
    new = new / (jnp.linalg.norm(new, axis=-1, keepdims=True) + 1e-8)
    return bank.at[indices].set(new)


@MODEL_REGISTRY.register(name="ContrastiveModel")
def build_contrastive(cfg, hw_switch=False, dtype=jnp.float32):
    return ContrastiveEncoder(cfg=cfg, hw_switch=hw_switch, dtype=dtype)
