"""Jitted train / eval steps.

TPU-first re-design of the reference hot loop
(`MViT/tools/train_net.py:33-310`, SURVEY.md section 3.2): one jitted,
mesh-sharded function fuses on-device preprocessing (normalize, RandAugment,
random erasing), MixUp, forward, loss, backward, optax update, and the metric
reductions. XLA inserts the gradient all-reduce over the mesh 'data' axis —
there is no explicit NCCL-equivalent call anywhere.

Design notes:
- bf16 activations via the model's compute dtype; params/optimizer f32; no
  GradScaler needed (TPU bf16 has fp32 range).
- per-iteration LR: the engine computes get_epoch_lr(epoch_exact) on host
  and passes it as a traced scalar into the step (`train_net.py:124-127`).
- the NaN guard (`misc.py:28-36`) is a device-side flag returned in metrics;
  the host raises, keeping the step fully compiled.
- per-sample portrait (`pm`) batches: the engine calls the portrait
  specialization's step on the transposed batch and merges outputs; the
  released PMV recipes never enable SWITCH_AUTO so the common path is one
  program (SURVEY/BASELINE).
"""

import jax
import jax.numpy as jnp
import optax

from pmv_tpu.data.mixup import MixUp, mixup_target
from pmv_tpu.data.rand_augment import RandAugment
from pmv_tpu.data.random_erasing import random_erasing
from pmv_tpu.engine.train_state import TrainState
from pmv_tpu.models import optimizer as optim
from pmv_tpu.models.losses import get_loss_func


def make_preprocess_fn(cfg, train: bool):
    """On-device preprocessing: uint8 [B,T,H,W,C] -> normalized float.

    Host workers stop at fixed-shape uint8 crops (decode + resize + crop);
    everything afterwards (the reference's per-frame PIL RandAugment at
    `kinetics.py:429-440`, normalize at `:443-448`, RandomErasing at
    `:505-515`) is fused into the jitted step.
    """
    pdt = jnp.dtype(cfg.TPU.PREPROCESS_DTYPE or "float32")
    mean = jnp.asarray(cfg.DATA.MEAN, jnp.float32) * 255.0
    # Multiply by the reciprocal: one fused multiply-add in the aug dtype.
    inv_std = (1.0 / (jnp.asarray(cfg.DATA.STD, jnp.float32) * 255.0))
    mean, inv_std = mean.astype(pdt), inv_std.astype(pdt)
    use_ra = train and cfg.AUG.ENABLE and cfg.AUG.AA_TYPE
    use_re = train and cfg.AUG.ENABLE and cfg.AUG.RE_PROB > 0
    use_ssl_cj = train and cfg.DATA.SSL_COLOR_JITTER
    use_td = train and cfg.DATA.TIME_DIFF_PROB > 0
    ra = RandAugment(cfg.AUG.AA_TYPE) if use_ra else None

    # AUG.RA_GROUPS: -1/0 = per-clip chains (the reference's sampling,
    # `kinetics.py:429-440`; measured +0.7% step time on v5e, ROADMAP r3,
    # so exact parity is the default), N > 0 = N batch chunks sharing a
    # chain (cheaper compile for sweep tooling).
    if cfg.AUG.RA_GROUPS > 0:
        ra_groups = cfg.AUG.RA_GROUPS
    else:
        ra_groups = 1 << 30  # clamped to the batch size in apply_batch

    use_ava_color = (
        train
        and cfg.DETECTION.ENABLE
        and cfg.AVA.TRAIN_USE_COLOR_AUGMENTATION
    )

    def preprocess(key, frames):
        x = frames.astype(pdt)
        if cfg.DATA.USE_BGR_ORDER:
            x = x[..., ::-1]
        if use_ava_color:
            # AVA color aug (`ava_dataset.py:318-332`): optional bri/con/sat
            # jitter, then PCA lighting jitter.
            from pmv_tpu.data.color_jitter import color_jitter, lighting_jitter

            if not cfg.AVA.TRAIN_PCA_JITTER_ONLY:
                k_cj0, key = jax.random.split(key)
                x = color_jitter(k_cj0, x, 0.4, 0.4, 0.4, hue=0.0)
            k_lj, key = jax.random.split(key)
            x = lighting_jitter(
                k_lj, x, 0.1,
                cfg.DATA.TRAIN_PCA_EIGVAL, cfg.DATA.TRAIN_PCA_EIGVEC,
            )
        if use_td:
            # Decode-time raw-frame aug (`decoder.py:644` augment_raw_frames).
            from pmv_tpu.data.color_jitter import augment_time_difference

            k_td, key = jax.random.split(key)
            x = augment_time_difference(k_td, x, cfg.DATA.TIME_DIFF_PROB)
        if use_ssl_cj:
            # SSL color aug (`kinetics.py:419` color_jitter_video_ssl).
            from pmv_tpu.data.color_jitter import ssl_color_jitter

            k_cj, key = jax.random.split(key)
            x = ssl_color_jitter(
                k_cj, x,
                bri_con_sat=tuple(cfg.DATA.SSL_COLOR_BRI_CON_SAT),
                hue=cfg.DATA.SSL_COLOR_HUE,
                p_convert_gray=cfg.DATA.COLOR_RND_GRAYSCALE,
                moco_v2_aug=cfg.DATA.SSL_MOCOV2_AUG,
                blur_sigma=(
                    cfg.DATA.SSL_BLUR_SIGMA_MIN[1],
                    cfg.DATA.SSL_BLUR_SIGMA_MAX[1],
                ),
            )
        if ra is not None:
            k_ra, key = jax.random.split(key)
            # Batch-level op choice: per-sample switch under vmap would run
            # every branch for every sample (see RandAugment.apply_batch).
            x = ra.apply_batch(k_ra, x, groups=ra_groups)
        x = (x - mean) * inv_std
        if use_re:
            k_re, key = jax.random.split(key)
            x = random_erasing(
                k_re, x,
                probability=cfg.AUG.RE_PROB,
                mode=cfg.AUG.RE_MODE,
            )
        return x

    return preprocess


def make_eval_preprocess_fn(cfg):
    """Shared eval/test preprocessing: uint8 frames -> normalized float.

    The reference applies channel-order (`DATA.USE_BGR_ORDER`) and
    normalization in the dataset for *all* splits (`kinetics.py:443-448`);
    every eval-side step must route through this so train and eval see the
    same channel order.
    """
    pdt = jnp.dtype(cfg.TPU.PREPROCESS_DTYPE or "float32")
    mean = (jnp.asarray(cfg.DATA.MEAN, jnp.float32) * 255.0).astype(pdt)
    inv_std = (
        1.0 / (jnp.asarray(cfg.DATA.STD, jnp.float32) * 255.0)
    ).astype(pdt)
    use_bgr = cfg.DATA.USE_BGR_ORDER

    def preprocess(frames):
        x = frames.astype(pdt)
        if use_bgr:
            x = x[..., ::-1]
        return (x - mean) * inv_std

    return preprocess


def pack_pathways(cfg, x, audio=None, audio_mis=None):
    """Single tensor -> per-pathway list (`datasets/utils.py` pack_pathway_output).

    SlowFast: slow = stride-alpha temporal subsample, fast = full.
    AVSlowFast additionally appends the log-mel audio clip (and the
    misaligned clip for the AVS sync loss, when provided).
    """
    if cfg.MODEL.ARCH in cfg.MODEL.SINGLE_PATHWAY_ARCH:
        return [x]
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        alpha = cfg.SLOWFAST.ALPHA
        slow = x[:, :: alpha]
        if cfg.MODEL.ARCH == "avslowfast":
            assert audio is not None, "avslowfast needs batch['audio']"
            if audio_mis is not None:
                return [slow, x, audio, audio_mis]
            return [slow, x, audio]
        return [slow, x]
    raise NotImplementedError(f"arch {cfg.MODEL.ARCH}")


def make_train_step(cfg, model, tx, model_pm=None):
    """Returns train_step(state, batch, rng, lr) -> (state, metrics).

    model_pm: optional portrait specialization (shared params). When given,
    the step runs both orientations and selects per-sample by batch["pm"]
    (the reference's shape-polymorphic batch split,
    `video_model_builder.py:2075-2096`, as two static programs).
    """
    loss_fun = get_loss_func(cfg.MODEL.LOSS_FUNC)
    preprocess = make_preprocess_fn(cfg, train=True)
    mixup_fn = (
        MixUp(
            mixup_alpha=cfg.MIXUP.ALPHA,
            cutmix_alpha=cfg.MIXUP.CUTMIX_ALPHA,
            mix_prob=cfg.MIXUP.PROB,
            switch_prob=cfg.MIXUP.SWITCH_PROB,
            label_smoothing=cfg.MIXUP.LABEL_SMOOTH_VALUE,
            num_classes=cfg.MODEL.NUM_CLASSES,
        )
        if cfg.MIXUP.ENABLE
        else None
    )
    has_bn = cfg.MODEL.MODEL_NAME in ("X3D", "ResNet", "SlowFast", "Uniformer")

    def train_step(state: TrainState, batch, rng, lr):
        frames, labels = batch["frames"], batch["labels"]
        k_pre, k_mix, k_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        )
        x = preprocess(k_pre, frames)
        if mixup_fn is not None:
            x, targets = mixup_fn(k_mix, x, labels)
        elif cfg.MODEL.LOSS_FUNC == "soft_cross_entropy":
            targets = mixup_target(
                labels, cfg.MODEL.NUM_CLASSES, 1.0,
                cfg.MIXUP.LABEL_SMOOTH_VALUE,
            )
        else:
            targets = labels
        inputs = pack_pathways(
            cfg, x, audio=batch.get("audio"),
            audio_mis=batch.get("audio_mis"),
        )
        if len(inputs) == 1:
            inputs = inputs[0]

        def apply_model(m, variables, m_inputs):
            if state.batch_stats:
                preds, updates = m.apply(
                    variables, m_inputs, train=True,
                    mutable=["batch_stats"], rngs={"dropout": k_drop},
                )
                if cfg.MODEL.FROZEN_BN:
                    # `misc.py:400-410` frozen_bn_stats: keep the loaded
                    # running statistics (batch norm still normalizes with
                    # batch stats in train mode; only the EMA is frozen).
                    return preds, state.batch_stats
                return preds, updates.get("batch_stats", state.batch_stats)
            preds = m.apply(
                variables, m_inputs, train=True, rngs={"dropout": k_drop},
            )
            return preds, state.batch_stats

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            preds, new_stats = apply_model(model, variables, inputs)
            aux_losses = {}
            if isinstance(preds, tuple):
                # AVSlowFast with misaligned audio returns per-junction AVS
                # sync losses (`train_net.py` adds them to the task loss).
                preds, aux_losses = preds
            if model_pm is not None:
                x_t = jnp.swapaxes(x, 2, 3)
                inputs_t = pack_pathways(cfg, x_t)
                it = inputs_t[0] if len(inputs_t) == 1 else inputs_t
                preds_pm, _ = apply_model(model_pm, variables, it)
                if isinstance(preds_pm, tuple):
                    preds_pm = preds_pm[0]
                pm = batch["pm"]
                preds = jnp.where(pm[:, None], preds_pm, preds)
            loss = loss_fun(preds.astype(jnp.float32), targets)
            for v in aux_losses.values():
                loss = loss + v
            return loss, (preds, new_stats)

        (loss, (preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grad_norm = optax.global_norm(grads)

        opt_state = optim.set_lr(state.opt_state, lr)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )

        # Top-k errors. Multi-label (float-vector) batches skip top-k like
        # the reference (`train_net.py` MULTI_LABEL branch; mAP at eval).
        # With mixup the reference relabels via the mixed target's top-2
        # (`train_net.py:210-219`): the top-2 pred scores merge into the
        # dominant mixed label so the train curve is comparable.
        if labels.ndim > 1:
            correct1 = correct5 = jnp.ones((preds.shape[0],), jnp.float32)
        else:
            metric_preds = preds.astype(jnp.float32)
            metric_labels = labels
            if mixup_fn is not None:
                rows = jnp.arange(metric_preds.shape[0])
                top2i = jax.lax.top_k(targets, 2)[1]
                metric_preds = metric_preds.at[rows, top2i[:, 0]].add(
                    metric_preds[rows, top2i[:, 1]]
                )
                metric_preds = metric_preds.at[rows, top2i[:, 1]].set(0.0)
                metric_labels = top2i[:, 0]
            topk = min(5, preds.shape[-1])
            top2 = jax.lax.top_k(metric_preds, topk)[1]
            correct1 = (top2[:, :1] == metric_labels[:, None]).any(axis=1)
            correct5 = (top2 == metric_labels[:, None]).any(axis=1)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "top1_err": (1.0 - correct1.mean()) * 100.0,
            "top5_err": (1.0 - correct5.mean()) * 100.0,
            "nan": (jnp.isnan(loss) | jnp.isinf(loss)
                    | jnp.isnan(grad_norm) | jnp.isinf(grad_norm)),
        }
        return new_state, metrics

    return train_step


def make_eval_step(cfg, model):
    """Returns eval_step(state, batch) -> preds (eval path, softmax'd head)."""
    preprocess = make_eval_preprocess_fn(cfg)

    def eval_step(state: TrainState, frames, audio=None):
        x = preprocess(frames)
        inputs = pack_pathways(cfg, x, audio=audio)
        if len(inputs) == 1:
            inputs = inputs[0]
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, inputs, train=False)

    return eval_step


def make_detection_train_step(cfg, model, tx):
    """Detection train step (AVA): BCE-with-logits over valid boxes
    (`train_net.py` detection branch)."""
    preprocess = make_preprocess_fn(cfg, train=True)

    def train_step(state: TrainState, batch, rng, lr):
        frames = batch["frames"]
        boxes, box_mask, labels = batch["boxes"], batch["box_mask"], batch["labels"]
        k_pre, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        x = preprocess(k_pre, frames)
        inputs = pack_pathways(cfg, x)
        xs = inputs[0] if len(inputs) == 1 else inputs

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                preds, updates = model.apply(
                    variables, xs, train=True, boxes=boxes, box_mask=box_mask,
                    mutable=["batch_stats"], rngs={"dropout": k_drop},
                )
                new_stats = updates.get("batch_stats", state.batch_stats)
            else:
                preds = model.apply(
                    variables, xs, train=True, boxes=boxes, box_mask=box_mask,
                    rngs={"dropout": k_drop},
                )
                new_stats = state.batch_stats
            per_box = optax.sigmoid_binary_cross_entropy(
                preds.astype(jnp.float32), labels
            ).mean(axis=-1)
            denom = jnp.maximum(box_mask.sum(), 1)
            loss = (per_box * box_mask).sum() / denom
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grad_norm = optax.global_norm(grads)
        opt_state = optim.set_lr(state.opt_state, lr)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "top1_err": jnp.zeros(()),
            "top5_err": jnp.zeros(()),
            "nan": (jnp.isnan(loss) | jnp.isinf(loss)
                    | jnp.isnan(grad_norm) | jnp.isinf(grad_norm)),
        }
        return new_state, metrics

    return train_step


def make_feat_step(cfg, model):
    """Feature-extraction step (Uniformer fork TEST.FEAT_EXTRACT): pooled
    backbone features instead of logits."""
    preprocess = make_eval_preprocess_fn(cfg)

    def feat_step(state: TrainState, frames):
        x = preprocess(frames)
        inputs = pack_pathways(cfg, x)
        xs = inputs[0] if len(inputs) == 1 else inputs
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        feats = model.apply(variables, xs, train=False, return_features=True)
        if isinstance(feats, tuple):
            feats = feats[0]
        if feats.ndim == 3:  # tokens [B, N, C]
            return feats.mean(axis=1)
        return feats.mean(axis=(1, 2, 3))  # grid [B, T, H, W, C]

    return feat_step


def init_state(cfg, model, example_batch, rng, tx=None):
    """Initialize params/batch_stats/opt_state from an example input.

    Returns (state, tx); builds the optax chain from the fresh params when tx
    is not supplied (param-group masks need the param tree).
    """
    frames = example_batch["frames"]
    x = frames.astype(jnp.float32)
    # audio_mis must reach init for AVSlowFast: the AVS projection params
    # only exist when the misaligned-audio input is present
    # (`video_model_builder.py:879-996` avs branch).
    inputs = pack_pathways(
        cfg, x, audio=example_batch.get("audio"),
        audio_mis=example_batch.get("audio_mis"),
    )
    if len(inputs) == 1:
        inputs = inputs[0]
    kwargs = {}
    if cfg.DETECTION.ENABLE and "boxes" in example_batch:
        kwargs = dict(
            boxes=jnp.asarray(example_batch["boxes"]),
            box_mask=jnp.asarray(example_batch["box_mask"]),
        )
    # Jit the init: un-jitted flax init runs the whole forward eagerly,
    # which is pathologically slow on remote/tunneled backends.
    variables = jax.jit(
        lambda k: model.init(k, inputs, train=False, **kwargs)
    )(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if tx is None:
        tx = optim.construct_optimizer(params, cfg)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    return state, tx
