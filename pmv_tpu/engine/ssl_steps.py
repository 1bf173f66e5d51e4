"""Jitted SSL (contrastive) train step.

Mirrors the reference's contrastive_forward / parameter-surgery hooks in
`MViT/tools/train_net.py:140-159` + `models/contrastive.py` as one pure
function: two device-augmented views -> online/momentum encoders -> task
loss (moco | simclr | byol | swav | mem) -> optax update -> EMA/queue/bank
state updates.
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pmv_tpu.engine import steps as sup_steps
from pmv_tpu.models import contrastive as cm
from pmv_tpu.models import optimizer as optim


@flax.struct.dataclass
class SSLTrainState:
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    momentum_params: Any  # EMA encoder (moco/byol)
    queue: Any            # [K, D] moco queue
    queue_ptr: Any
    bank: Any             # [N, D] memory bank ('mem' type / kNN eval)
    predictor_params: Any  # byol predictor
    prototypes: Any        # swav prototypes [P, D]


def init_ssl_state(cfg, model, example_batch, rng, tx=None):
    frames = example_batch["frames"].astype(jnp.float32)
    variables = jax.jit(lambda k: model.init(k, frames, train=False))(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    dim = cfg.CONTRASTIVE.DIM
    ssl_type = cfg.CONTRASTIVE.TYPE
    predictor_params = None
    if ssl_type == "byol":
        pred = cm.PredictorMLP(dim=dim, hidden=cfg.CONTRASTIVE.MLP_DIM)
        predictor_params = pred.init(
            rng, jnp.zeros((1, dim), jnp.float32)
        )["params"]
    trainable = {"online": params}
    if predictor_params is not None:
        trainable["predictor"] = predictor_params
    prototypes = None
    if ssl_type == "swav":
        prototypes = jax.random.normal(
            rng, (cfg.CONTRASTIVE.SWAV_QEUE_LEN or 256, dim), jnp.float32
        ) * 0.02
        trainable["prototypes"] = prototypes
    if tx is None:
        # Masks must be built over the full trainable tree (online +
        # predictor + prototypes), not the bare encoder params.
        tx = optim.construct_optimizer(trainable, cfg)
    opt_state = tx.init(trainable)
    return SSLTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        momentum_params=params,
        queue=jnp.zeros((cfg.CONTRASTIVE.QUEUE_LEN, dim), jnp.float32),
        queue_ptr=jnp.zeros((), jnp.int32),
        bank=jnp.zeros((cfg.CONTRASTIVE.LENGTH, dim), jnp.float32)
        if ssl_type == "mem" or cfg.CONTRASTIVE.KNN_ON
        else None,
        predictor_params=predictor_params,
        prototypes=prototypes,
    ), tx


def make_masked_train_step(cfg, model, tx):
    """MaskMViT (MaskFeat) train step: masked-token HOG regression."""
    from pmv_tpu.models.masked import masked_loss

    preprocess = sup_steps.make_preprocess_fn(cfg, train=True)

    def train_step(state, batch, rng, lr):
        k_pre, k_mask, k_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        )
        x = preprocess(k_pre, batch["frames"])
        # Loader-generated blockwise mask (AUG.GEN_MASK_LOADER) takes
        # priority over the model's on-device random masking.
        loader_mask = batch.get("mask")

        def loss_fn(params):
            pred, target, mask = model.apply(
                {"params": params}, x, mask=loader_mask, train=True,
                rngs={"mask": k_mask, "dropout": k_drop},
            )
            return masked_loss(pred, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        opt_state = optim.set_lr(state.opt_state, lr)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "nan": jnp.isnan(loss) | jnp.isinf(loss),
        }
        return new_state, metrics

    return train_step


def init_masked_state(cfg, model, example_batch, rng, tx=None):
    frames = example_batch["frames"].astype(jnp.float32)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "mask": jax.random.fold_in(k, 1)}, frames,
            train=False,
        )
    )(rng)
    params = variables["params"]
    if tx is None:
        tx = optim.construct_optimizer(params, cfg)
    from pmv_tpu.engine.train_state import TrainState

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    ), tx


def make_ssl_feature_step(cfg, model):
    """Jitted eval-mode feature extraction for the kNN monitor
    (`contrastive.py` KNN eval; features are L2-normalized like the bank)."""
    preprocess = sup_steps.make_preprocess_fn(cfg, train=False)

    def feature_step(state: SSLTrainState, frames):
        x = preprocess(None, frames)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        z = model.apply(variables, x, train=False).astype(jnp.float32)
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

    return feature_step


def make_ssl_train_step(cfg, model, tx):
    ssl_type = cfg.CONTRASTIVE.TYPE
    temperature = cfg.CONTRASTIVE.T
    mom = cfg.CONTRASTIVE.MOMENTUM
    preprocess = sup_steps.make_preprocess_fn(cfg, train=True)

    def encode(params, batch_stats, x, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train and batch_stats:
            z, updates = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
            )
            return z.astype(jnp.float32), updates["batch_stats"]
        z = model.apply(variables, x, train=train)
        return z.astype(jnp.float32), batch_stats

    def train_step(state: SSLTrainState, batch, rng, lr):
        frames = batch["frames"]
        indices = batch["index"]
        k1, k2 = jax.random.split(jax.random.fold_in(rng, state.step))
        if frames.ndim == 6:
            # Multi-clip positives from the host decoder ([B, V, T, H, W, C],
            # DATA.TRAIN_CROP_NUM_TEMPORAL/SPATIAL): distinct temporal /
            # spatial views, each further device-augmented.
            f1 = frames[:, 0]
            f2 = frames[:, 1 % frames.shape[1]]
        else:
            f1 = f2 = frames
        view1 = preprocess(k1, f1)
        view2 = preprocess(k2, f2)

        def loss_fn(trainable):
            params = trainable["online"]
            z1, new_stats = encode(params, state.batch_stats, view1, True)
            if ssl_type == "moco":
                z2, _ = encode(
                    state.momentum_params, state.batch_stats, view2, False
                )
                z2 = jax.lax.stop_gradient(z2)
                loss = cm.moco_loss(z1, z2, state.queue, temperature)
            elif ssl_type == "simclr":
                z2, new_stats = encode(params, new_stats, view2, True)
                loss = cm.simclr_loss(z1, z2, temperature)
            elif ssl_type == "byol":
                pred = cm.PredictorMLP(
                    dim=cfg.CONTRASTIVE.DIM, hidden=cfg.CONTRASTIVE.MLP_DIM
                )
                p1 = pred.apply({"params": trainable["predictor"]}, z1)
                z2, _ = encode(
                    state.momentum_params, state.batch_stats, view2, False
                )
                loss = cm.byol_loss(p1, jax.lax.stop_gradient(z2))
            elif ssl_type == "swav":
                z2, new_stats = encode(params, new_stats, view2, True)
                loss = cm.swav_loss(
                    z1, z2, trainable["prototypes"], temperature
                )
            elif ssl_type == "mem":
                loss = cm.mem_bank_loss(
                    z1, jax.lax.stop_gradient(state.bank), indices, temperature
                )
            else:
                raise NotImplementedError(f"CONTRASTIVE.TYPE {ssl_type}")
            return loss, (z1, new_stats)

        trainable = {"online": state.params}
        if state.predictor_params is not None:
            trainable["predictor"] = state.predictor_params
        if state.prototypes is not None:
            trainable["prototypes"] = state.prototypes

        (loss, (z1, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        grad_norm = optax.global_norm(grads)
        opt_state = optim.set_lr(state.opt_state, lr)
        updates, new_opt_state = tx.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        new_momentum = (
            cm.ema_update(new_trainable["online"], state.momentum_params, mom)
            if ssl_type in ("moco", "byol")
            else state.momentum_params
        )
        new_queue, new_ptr = state.queue, state.queue_ptr
        if ssl_type == "moco":
            k_feats, _ = encode(
                new_momentum, state.batch_stats, view2, False
            )
            new_queue, new_ptr = cm.queue_update(
                state.queue, state.queue_ptr, jax.lax.stop_gradient(k_feats)
            )
        new_bank = state.bank
        if state.bank is not None:
            new_bank = cm.bank_update(
                state.bank, indices, jax.lax.stop_gradient(z1),
                cfg.CONTRASTIVE.MOMENTUM,
            )

        new_state = SSLTrainState(
            step=state.step + 1,
            params=new_trainable["online"],
            batch_stats=new_stats,
            opt_state=new_opt_state,
            momentum_params=new_momentum,
            queue=new_queue,
            queue_ptr=new_ptr,
            bank=new_bank,
            predictor_params=new_trainable.get(
                "predictor", state.predictor_params
            ),
            prototypes=new_trainable.get("prototypes", state.prototypes),
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "nan": jnp.isnan(loss) | jnp.isinf(loss),
        }
        return new_state, metrics

    return train_step
