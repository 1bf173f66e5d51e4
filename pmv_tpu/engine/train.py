"""Training loop (`MViT/tools/train_net.py:550-814`), single-controller JAX.

Structure parity with the reference train():
seeds -> build model/optimizer -> auto-resume -> loaders -> meters/TB ->
epoch loop {shuffle, train_epoch, precise-BN, checkpoint, eval_epoch} ->
final result string. The per-iteration hot loop is one jitted sharded step
(engine/steps.py); H2D transfer is a single device_put per batch.

Portrait (`pm`) batches: when a batch contains portrait samples the engine
invokes the pm-aware step variant (portrait specialization over shared
params); the released PMV recipes keep SWITCH_AUTO off so the common path
compiles exactly one program.
"""

import math
import pprint

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.data import loader as loader_mod
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
from pmv_tpu.models import optimizer as optim
from pmv_tpu.parallel import mesh as mesh_lib
from pmv_tpu.utils import checkpoint as cu
from pmv_tpu.utils import logging as pmv_logging
from pmv_tpu.utils import meters as meters_mod
from pmv_tpu.utils import misc
from pmv_tpu.utils.lr_policy import get_lr_at_epoch

logger = pmv_logging.get_logger(__name__)


def train_epoch(
    train_loader, train_step, train_step_pm, state, meter, cur_epoch, cfg,
    mesh, rng,
):
    data_size = len(train_loader)
    # jax.profiler trace of a few steady-state steps (TPU.PROFILE_DIR;
    # replaces the reference's absent torch.profiler, SURVEY.md section 5).
    prof_dir = cfg.TPU.PROFILE_DIR
    prof_window = (10, 15) if data_size > 15 else (0, min(2, data_size))

    # Metrics stay on device between LOG_PERIOD boundaries: a per-step
    # device_get would serialize host dispatch against device compute
    # (the reference pays the same .item() sync on GPU at
    # `train_net.py:271-277`; TPU async dispatch is the whole point).
    # NaN / loss-explosion guards run at flush granularity (up to
    # LOG_PERIOD-1 poisoned steps may execute before the raise — the price
    # of async dispatch). A poisoned CHECKPOINT can never be written: the
    # epoch-end flush below raises before train() reaches save_checkpoint,
    # and the device-side flag also trips on non-finite grad norms, which
    # poison params one step before the loss shows it.
    pending = []
    flush_every = max(1, cfg.LOG_PERIOD)

    def flush_metrics():
        for it, lr_it, mb_size, m in pending:
            m = jax.device_get(m)
            if bool(m["nan"]):
                raise RuntimeError(
                    f"ERROR: Got NaN losses at iter {it} "
                    f"(`misc.py:28-36` NaN guard)"
                )
            if (
                cfg.TRAIN.KILL_LOSS_EXPLOSION_FACTOR > 0.0
                and meter.loss.count > 10
                and float(m["loss"])
                > cfg.TRAIN.KILL_LOSS_EXPLOSION_FACTOR
                * meter.loss.get_global_avg()
            ):
                raise RuntimeError(
                    f"ERROR: Got Loss explosion of {float(m['loss'])}"
                )
            meter.update_stats(
                float(m["top1_err"]),
                float(m["top5_err"]),
                float(m["loss"]),
                lr_it,
                float(m["grad_norm"]),
                mb_size * max(cfg.NUM_SHARDS, 1),
            )
            meter.log_iter_stats(cur_epoch, it)
        pending.clear()

    keep = {"frames", "labels", "pm", "boxes", "box_mask", "index",
            "audio", "audio_mis"}

    def prepare_batch(batch):
        """Host-side batch prep + H2D transfer enqueue. Runs on the
        device-prefetch thread so the transfer of batch N+1 overlaps step
        N's compute (reference: pinned-memory non_blocking copies,
        `train_net.py:88-111`)."""
        if "audio_mis" in batch and cfg.DATA.GET_MISALIGNED_AUDIO:
            # AVS easy negatives (`loader.py:25-43`): before MIX_NEG_EPOCH
            # every row takes the *next* sample's misaligned audio (easy,
            # different video); afterwards only the first EASY_NEG_RATIO
            # fraction does, leaving same-video hard negatives.
            n = batch["audio_mis"].shape[0]
            sn = (
                max(int(cfg.DATA.EASY_NEG_RATIO * n), 1)
                if cur_epoch >= cfg.DATA.MIX_NEG_EPOCH
                else n
            )
            idx = np.arange(n)
            idx[:sn] = np.arange(1, sn + 1) % sn
            batch["audio_mis"] = batch["audio_mis"][idx]
        return mesh_lib.shard_batch(
            {k: v for k, v in batch.items() if k in keep}, mesh
        )

    if cfg.TPU.DEVICE_PREFETCH > 0:
        from pmv_tpu.engine.prefetch import DevicePrefetcher

        stream = DevicePrefetcher(
            train_loader, prepare_batch, depth=cfg.TPU.DEVICE_PREFETCH
        )
    else:
        stream = ((b, prepare_batch(b)) for b in train_loader)

    meter.iter_tic()
    for cur_iter, (batch, device_batch) in enumerate(stream):
        if prof_dir and cur_epoch == 0 and cur_iter == prof_window[0]:
            jax.profiler.start_trace(prof_dir)
        epoch_exact = cur_epoch + float(cur_iter) / data_size
        lr = get_lr_at_epoch(cfg, epoch_exact)
        meter.data_toc()
        step_fn = train_step_pm if batch["pm"].any() else train_step
        state, metrics = step_fn(state, device_batch, rng, lr)
        pending.append((cur_iter, lr, batch["frames"].shape[0], metrics))
        meter.iter_toc()
        if (cur_iter + 1) % flush_every == 0:
            flush_metrics()
        if prof_dir and cur_epoch == 0 and cur_iter == prof_window[1]:
            jax.profiler.stop_trace()
            prof_dir = None  # one trace per job
        meter.iter_tic()
    flush_metrics()
    if prof_dir and cur_epoch == 0:  # loop ended inside the trace window
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
    meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return state


def eval_epoch(val_loader, eval_step, eval_step_pm, state, meter, cur_epoch, cfg, mesh):
    meter.iter_tic()
    for cur_iter, batch in enumerate(val_loader):
        frames = jax.device_put(batch["frames"], mesh_lib.batch_sharding(mesh))
        meter.data_toc()
        if eval_step_pm is not None and batch["pm"].any():
            preds = eval_step_pm(state, frames, jnp.asarray(batch["pm"]))
        else:
            preds = eval_step(state, frames)
        preds = np.asarray(jax.device_get(preds))
        labels = batch["labels"]
        from pmv_tpu.utils import metrics as metrics_mod

        if np.asarray(labels).ndim > 1:
            # Multi-label (Charades): no top-k; the meter reports mAP over
            # the gathered predictions (`train_net.py` MULTI_LABEL branch).
            top1_err = top5_err = 0.0
        else:
            num_topks = metrics_mod.topks_correct(preds, labels, (1, 5))
            top1_err, top5_err = [
                (1.0 - float(x) / preds.shape[0]) * 100.0 for x in num_topks
            ]
        meter.iter_toc()
        meter.update_stats(top1_err, top5_err, preds.shape[0] * max(cfg.NUM_SHARDS, 1))
        meter.update_predictions(preds, labels)
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
    stats = meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return stats


def _make_pm_eval_step(cfg, model_land, model_port):
    """Eval step selecting per-sample between orientations."""
    preprocess = steps.make_eval_preprocess_fn(cfg)

    def eval_step_pm(state, frames, pm):
        x = preprocess(frames)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        inputs = steps.pack_pathways(cfg, x)
        xs = inputs[0] if len(inputs) == 1 else inputs
        preds_land = model_land.apply(variables, xs, train=False)
        x_t = jnp.swapaxes(x, 2, 3)
        inputs_t = steps.pack_pathways(cfg, x_t)
        xt = inputs_t[0] if len(inputs_t) == 1 else inputs_t
        preds_port = model_port.apply(variables, xt, train=False)
        return jnp.where(pm[:, None], preds_port, preds_land)

    return eval_step_pm


def train(cfg):
    """Train a model per cfg (entry mirrored from `tools/train_net.py`)."""
    pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    logger.info("Train with config:")
    logger.info(pprint.pformat(cfg))

    # Multigrid schedules (`train_net.py:566-572`). Base shapes change per
    # epoch; jit re-specializes per shape so no trainer rebuild is needed.
    multigrid = None
    if cfg.MULTIGRID.LONG_CYCLE or cfg.MULTIGRID.SHORT_CYCLE:
        from pmv_tpu.utils.multigrid import MultigridSchedule

        multigrid = MultigridSchedule()
        cfg = multigrid.init_multigrid(cfg)

    mesh = mesh_lib.create_mesh(cfg)
    rng = misc.root_key(cfg)

    model = build_model(cfg)
    needs_pm = (
        cfg.DATA.TRAIN_CROP_SIZE_RECT_SWITCH_AUTO
        or cfg.DATA.TEST_CROP_SIZE_RECT_SWITCH_AUTO
    )
    model_port = build_model(cfg, hw_switch=True) if needs_pm else None

    train_loader = loader_mod.construct_loader(cfg, "train")
    val_loader = loader_mod.construct_loader(cfg, "val")

    example = next(iter(train_loader))
    example_batch = {
        "frames": example["frames"],
        "labels": example["labels"],
    }
    state, tx = steps.init_state(cfg, model, example_batch, rng)
    if cfg.LOG_MODEL_INFO:
        misc.log_model_info(
            state, cfg,
            model=None if cfg.DETECTION.ENABLE else model,
            example_batch=example_batch,
        )
    state, start_epoch = cu.load_train_checkpoint(cfg, state)
    if (
        start_epoch == 0
        and not cfg.TRAIN.CHECKPOINT_FILE_PATH
        and cfg.MODEL.MODEL_NAME in ("Uniformer", "Uniformerframe")
        and cfg.UNIFORMER.PRETRAIN_NAME
    ):
        # Pretrain registry auto-load (`Uniformer/slowfast/models/
        # build.py:42-46` + `uniformer.py:16-29`).
        from pmv_tpu.utils import pretrain

        state = state.replace(
            params=pretrain.load_pretrained_params(cfg, state.params)
        )
    state = mesh_lib.replicate(state, mesh, cfg.TPU.SHARD_STRATEGY)

    if cfg.DETECTION.ENABLE:
        train_step = jax.jit(steps.make_detection_train_step(cfg, model, tx))
        train_step_pm = train_step
    else:
        train_step = jax.jit(steps.make_train_step(cfg, model, tx))
        train_step_pm = (
            jax.jit(steps.make_train_step(cfg, model, tx, model_pm=model_port))
            if needs_pm
            else train_step
        )
    eval_step = jax.jit(steps.make_eval_step(cfg, model))
    eval_step_pm = (
        jax.jit(_make_pm_eval_step(cfg, model, model_port))
        if needs_pm
        else None
    )

    train_meter = meters_mod.TrainMeter(len(train_loader), cfg)
    val_meter = meters_mod.ValMeter(len(val_loader), cfg)
    epoch_timer = meters_mod.EpochTimer()

    writer = None
    if cfg.TENSORBOARD.ENABLE and jax.process_index() == 0:
        from pmv_tpu.visualization.tensorboard_vis import TensorboardWriter

        writer = TensorboardWriter(cfg)

    logger.info("Start epoch: %d", start_epoch + 1)
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        if cur_epoch > 0 and cfg.DATA.LOADER_CHUNK_SIZE > 0:
            # Chunked-CSV epoch advance (`train_net.py:675-686`): each epoch
            # trains on the next LOADER_CHUNK_SIZE-row slice of the split
            # file, cycling through LOADER_CHUNK_OVERALL_SIZE rows.
            num_chunks = math.ceil(
                cfg.DATA.LOADER_CHUNK_OVERALL_SIZE
                / cfg.DATA.LOADER_CHUNK_SIZE
            )
            cfg.DATA.SKIP_ROWS = (
                cur_epoch % num_chunks * cfg.DATA.LOADER_CHUNK_SIZE
            )
            logger.info("chunked loader: skip_rows %d", cfg.DATA.SKIP_ROWS)
            train_loader = loader_mod.construct_loader(cfg, "train")
            train_meter = meters_mod.TrainMeter(len(train_loader), cfg)
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                # New base shape: rebuild loaders and — because the BN type
                # follows the batch size (`multigrid.py:91-97`) — the model
                # and jitted steps; the state transfers through the BN
                # converter (reference build_trainer + checkpoint reload,
                # `train_net.py:687-711`).
                train_loader = loader_mod.construct_loader(cfg, "train")
                train_meter = meters_mod.TrainMeter(len(train_loader), cfg)
                model = build_model(cfg)
                if needs_pm:
                    model_port = build_model(cfg, hw_switch=True)
                example = next(iter(train_loader))
                template, tx = steps.init_state(
                    cfg, model,
                    {"frames": example["frames"], "labels": example["labels"]},
                    rng,
                )
                state = cu.adapt_state_across_bn(state, template)
                state = mesh_lib.replicate(state, mesh, cfg.TPU.SHARD_STRATEGY)
                train_step = jax.jit(steps.make_train_step(cfg, model, tx))
                train_step_pm = (
                    jax.jit(steps.make_train_step(
                        cfg, model, tx, model_pm=model_port))
                    if needs_pm
                    else train_step
                )
                eval_step = jax.jit(steps.make_eval_step(cfg, model))
                if needs_pm:
                    eval_step_pm = jax.jit(
                        _make_pm_eval_step(cfg, model, model_port)
                    )
        train_loader.set_epoch(cur_epoch)
        epoch_timer.epoch_tic()
        state = train_epoch(
            train_loader, train_step, train_step_pm, state, train_meter,
            cur_epoch, cfg, mesh, rng,
        )
        epoch_timer.epoch_toc()
        logger.info(
            "Epoch %d takes %.2fs. Epochs from %d to %d take %.2fs in "
            "average and %.2fs in median.",
            cur_epoch, epoch_timer.last_epoch_time(), start_epoch,
            cur_epoch, epoch_timer.avg_epoch_time(),
            epoch_timer.median_epoch_time(),
        )

        is_checkp = cu.is_checkpoint_epoch(cfg, cur_epoch)
        is_eval = misc.is_eval_epoch(
            cfg, cur_epoch,
            multigrid.schedule if multigrid is not None else None,
        )

        if cfg.BN.USE_PRECISE_STATS and state.batch_stats:
            from pmv_tpu.engine import precise_bn

            state = precise_bn.calculate_and_update_precise_bn(
                train_loader, state, cfg, model, mesh,
            )

        if is_checkp and jax.process_index() == 0:
            cu.save_checkpoint(cfg.OUTPUT_DIR, state, cur_epoch, cfg)
        if is_eval:
            stats = eval_epoch(
                val_loader, eval_step, eval_step_pm, state, val_meter,
                cur_epoch, cfg, mesh,
            )
            if writer is not None:
                writer.add_scalars(
                    {
                        "Val/Top1_err": stats["top1_err"],
                        "Val/Top5_err": stats["top5_err"],
                    },
                    global_step=cur_epoch,
                )

    if writer is not None:
        writer.close()

    result_string = (
        f"_p{misc.params_count(state.params) / 1e6:.2f}M "
        f"_t{epoch_timer.median_epoch_time() / 60:.2f}m "
        f"top1 {val_meter.min_top1_err:.2f} top5 {val_meter.min_top5_err:.2f}"
    )
    logger.info("training done: %s", result_string)
    return result_string
