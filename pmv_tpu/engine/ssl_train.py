"""SSL training loop (ContrastiveModel / MaskMViT dispatch of the reference
train_net contrastive branches, `train_net.py:140-159`)."""

import pprint

import jax
import numpy as np

from pmv_tpu.data import loader as loader_mod
from pmv_tpu.engine import ssl_steps
from pmv_tpu.models import build_model
from pmv_tpu.parallel import mesh as mesh_lib
from pmv_tpu.utils import checkpoint as cu
from pmv_tpu.utils import logging as pmv_logging
from pmv_tpu.utils import misc
from pmv_tpu.utils import meters as meters_mod
from pmv_tpu.utils.lr_policy import get_lr_at_epoch

logger = pmv_logging.get_logger(__name__)


def train_ssl(cfg):
    pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    logger.info("SSL train (%s) with config:", cfg.CONTRASTIVE.TYPE)
    logger.info(pprint.pformat(cfg))

    mesh = mesh_lib.create_mesh(cfg)
    rng = misc.root_key(cfg)
    model = build_model(cfg)
    train_loader = loader_mod.construct_loader(cfg, "train")
    example = next(iter(train_loader))
    if cfg.MODEL.MODEL_NAME == "MaskMViT":
        state, tx = ssl_steps.init_masked_state(
            cfg, model, {"frames": example["frames"]}, rng
        )
        train_step = jax.jit(ssl_steps.make_masked_train_step(cfg, model, tx))
    else:
        state, tx = ssl_steps.init_ssl_state(
            cfg, model,
            {"frames": example["frames"], "index": example["index"]}, rng,
        )
        train_step = jax.jit(ssl_steps.make_ssl_train_step(cfg, model, tx))
    state = mesh_lib.replicate(state, mesh, cfg.TPU.SHARD_STRATEGY)

    meter = meters_mod.TrainMeter(len(train_loader), cfg)
    start_epoch = 0
    if cfg.TRAIN.AUTO_RESUME and cu.has_checkpoint(cfg.OUTPUT_DIR, cfg.TASK):
        last = cu.get_last_checkpoint(cfg.OUTPUT_DIR, cfg.TASK)
        state, epoch = cu.load_checkpoint(last, state)
        start_epoch = epoch + 1
        logger.info("Resumed SSL training from %s", last)

    # kNN monitor (`contrastive.py` KNN eval): labels of the bank rows are
    # the train-set labels at the matching sample indices.
    knn_on = cfg.CONTRASTIVE.KNN_ON and state.bank is not None
    bank_labels = None
    if knn_on:
        labels = getattr(train_loader.dataset, "_labels", None)
        if labels is None:
            logger.warning("dataset exposes no _labels; kNN eval disabled")
            knn_on = False
        else:
            bank_labels = jax.numpy.asarray(np.asarray(labels))
    if knn_on:
        from pmv_tpu.models import contrastive as cm

        val_loader = loader_mod.construct_loader(cfg, "val")
        feature_step = jax.jit(ssl_steps.make_ssl_feature_step(cfg, model))

        def knn_eval(state, cur_epoch):
            top1, seen = 0, 0
            for batch in val_loader:
                feats = feature_step(state, jax.numpy.asarray(batch["frames"]))
                scores = cm.knn_predict(
                    state.bank, bank_labels, feats, cfg.MODEL.NUM_CLASSES,
                    k=min(200, state.bank.shape[0]),
                )
                pred = np.asarray(jax.numpy.argmax(scores, axis=-1))
                top1 += int((pred == batch["labels"]).sum())
                seen += len(pred)
            acc = 100.0 * top1 / max(seen, 1)
            pmv_logging.log_json_stats(
                {"_type": "ssl_knn_epoch", "epoch": cur_epoch,
                 "knn_top1_acc": round(acc, 2)}
            )
            return acc

    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        train_loader.set_epoch(cur_epoch)
        data_size = len(train_loader)
        meter.iter_tic()
        for cur_iter, batch in enumerate(train_loader):
            lr = get_lr_at_epoch(cfg, cur_epoch + cur_iter / data_size)
            dev_keys = {"frames": batch["frames"], "index": batch["index"]}
            if "mask" in batch:  # AUG.GEN_MASK_LOADER blockwise masks
                dev_keys["mask"] = batch["mask"]
            device_batch = mesh_lib.shard_batch(dev_keys, mesh)
            meter.data_toc()
            state, metrics = train_step(state, device_batch, rng, lr)
            metrics = jax.device_get(metrics)
            if bool(metrics["nan"]):
                raise RuntimeError(f"NaN SSL loss at iter {cur_iter}")
            meter.iter_toc()
            meter.update_stats(
                0.0, 0.0, float(metrics["loss"]), lr,
                float(metrics["grad_norm"]),
                batch["frames"].shape[0] * max(cfg.NUM_SHARDS, 1),
            )
            meter.log_iter_stats(cur_epoch, cur_iter)
            meter.iter_tic()
        meter.log_epoch_stats(cur_epoch)
        meter.reset()
        if cu.is_checkpoint_epoch(cfg, cur_epoch) and jax.process_index() == 0:
            cu.save_checkpoint(cfg.OUTPUT_DIR, state, cur_epoch, cfg)
        if knn_on and misc.is_eval_epoch(cfg, cur_epoch):
            knn_eval(state, cur_epoch)
    return state
