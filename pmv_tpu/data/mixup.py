"""On-device MixUp / CutMix with label smoothing.

Functional JAX re-design of the reference's timm-port
(`MViT/slowfast/datasets/mixup.py:22-194`): batch-level mixing against the
flipped batch, Beta-sampled lam, mixup<->cutmix switching, one-hot +
label-smoothing soft targets. Runs inside the jitted train step (the
reference runs it on GPU per-iteration, `train_net.py:130-132`).

Inputs are channels-last video batches [B, T, H, W, C].
"""

import jax
import jax.numpy as jnp


def mixup_target(labels, num_classes, lam, smoothing):
    """Soft targets: lam * onehot(y) + (1-lam) * onehot(flip(y)), smoothed."""
    off_value = smoothing / num_classes
    on_value = 1.0 - smoothing + off_value
    # timm scatters on_value into a full(off_value) tensor.
    y1 = jax.nn.one_hot(labels, num_classes) * (on_value - off_value) + off_value
    y2 = jax.nn.one_hot(labels[::-1], num_classes) * (on_value - off_value) + off_value
    return lam * y1 + (1.0 - lam) * y2


def _rand_bbox(key, height, width, lam):
    """CutMix box: ratio = sqrt(1-lam), center uniform; returns mask + true lam."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (height * ratio).astype(jnp.int32)
    cut_w = (width * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, height)
    cx = jax.random.randint(kx, (), 0, width)
    yl = jnp.clip(cy - cut_h // 2, 0, height)
    yh = jnp.clip(cy + cut_h // 2, 0, height)
    xl = jnp.clip(cx - cut_w // 2, 0, width)
    xh = jnp.clip(cx + cut_w // 2, 0, width)
    rows = jnp.arange(height)
    cols = jnp.arange(width)
    mask = ((rows >= yl) & (rows < yh))[:, None] & ((cols >= xl) & (cols < xh))[None, :]
    box_area = (yh - yl) * (xh - xl)
    lam_corrected = 1.0 - box_area / float(height * width)
    return mask, lam_corrected


class MixUp:
    """Batch-level MixUp/CutMix. Call inside jit with an explicit PRNG key."""

    def __init__(
        self,
        mixup_alpha=1.0,
        cutmix_alpha=0.0,
        mix_prob=1.0,
        switch_prob=0.5,
        label_smoothing=0.1,
        num_classes=1000,
    ):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.mix_prob = mix_prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    def __call__(self, key, x, labels):
        """Returns (mixed_x, soft_targets). x: [B, T, H, W, C], labels: [B]."""
        k_apply, k_switch, k_mix, k_cut, k_box = jax.random.split(key, 5)

        use_cutmix = jnp.logical_and(
            self.cutmix_alpha > 0.0,
            jax.random.uniform(k_switch) < self.switch_prob,
        )
        if self.mixup_alpha > 0.0:
            lam_mix = jax.random.beta(k_mix, self.mixup_alpha, self.mixup_alpha)
        else:
            lam_mix = jnp.float32(1.0)
        if self.cutmix_alpha > 0.0:
            lam_cut = jax.random.beta(k_cut, self.cutmix_alpha, self.cutmix_alpha)
        else:
            lam_cut = jnp.float32(1.0)

        height, width = x.shape[-3], x.shape[-2]
        mask, lam_cut_true = _rand_bbox(k_box, height, width, lam_cut)
        x_flip = x[::-1]

        x_cutmix = jnp.where(mask[..., None], x_flip, x)
        lam = jnp.where(use_cutmix, lam_cut_true, lam_mix)
        x_mixup = x * lam_mix + x_flip * (1.0 - lam_mix)
        x_mixed = jnp.where(use_cutmix, x_cutmix, x_mixup)

        # With prob (1 - mix_prob), skip mixing entirely (lam=1).
        apply = jax.random.uniform(k_apply) < self.mix_prob
        lam = jnp.where(apply, lam, 1.0)
        x_out = jnp.where(apply, x_mixed, x)

        targets = mixup_target(labels, self.num_classes, lam, self.label_smoothing)
        return x_out, targets
