"""Multi-view testing (`MViT/tools/test_net.py:27-381`).

perform_test: every test-loader sample is one deterministic
(temporal_view, spatial_crop) of a video; per-clip softmax scores are
ensembled per-video in the TestMeter (sum/max, `meters.py:247-436`).
Cross-host gathers use `multihost_utils.process_allgather` (the XLA-native
equivalent of the reference's `du.all_gather`, `test_net.py:131-136`).
Includes the dense spatial-crop ratio-grid sweep (`test_net.py:358-379`).
"""

import os
import pickle
import pprint

import jax
import numpy as np

from pmv_tpu.data import loader as loader_mod
from pmv_tpu.engine import steps
from pmv_tpu.engine.train import _make_pm_eval_step
from pmv_tpu.models import build_model
from pmv_tpu.parallel import mesh as mesh_lib
from pmv_tpu.utils import checkpoint as cu
from pmv_tpu.utils import logging as pmv_logging
from pmv_tpu.utils import meters as meters_mod
from pmv_tpu.utils import misc

logger = pmv_logging.get_logger(__name__)


def _allgather_if_multihost(arrays):
    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    return [multihost_utils.process_allgather(a) for a in arrays]


def perform_test(test_loader, eval_step, eval_step_pm, state, test_meter, cfg, mesh):
    test_meter.iter_tic()
    for cur_iter, batch in enumerate(test_loader):
        frames = jax.device_put(batch["frames"], mesh_lib.batch_sharding(mesh))
        test_meter.data_toc()
        if eval_step_pm is not None and batch["pm"].any():
            import jax.numpy as jnp

            preds = eval_step_pm(state, frames, jnp.asarray(batch["pm"]))
        else:
            preds = eval_step(state, frames)
        preds = np.asarray(jax.device_get(preds))
        labels, video_idx = batch["labels"], batch["index"]
        preds, labels, video_idx = _allgather_if_multihost(
            [preds, labels, video_idx]
        )
        test_meter.iter_toc()
        test_meter.update_stats(preds, labels, video_idx)
        test_meter.log_iter_stats(cur_iter)
        test_meter.iter_tic()
    stats = test_meter.finalize_metrics()
    return test_meter, stats


def extract_features(cfg, state, model, mesh):
    """TEST.FEAT_EXTRACT: dump pooled backbone features to OUTPUT_DIR."""
    test_loader = loader_mod.construct_loader(cfg, "test")
    feat_step = jax.jit(steps.make_feat_step(cfg, model))
    feats, indices = [], []
    for batch in test_loader:
        frames = jax.device_put(batch["frames"], mesh_lib.batch_sharding(mesh))
        feats.append(np.asarray(jax.device_get(feat_step(state, frames))))
        indices.append(batch["index"])
    out = {
        "features": np.concatenate(feats),
        "index": np.concatenate(indices),
    }
    path = os.path.join(cfg.OUTPUT_DIR, "features.npz")
    if jax.process_index() == 0:
        np.savez(path, **out)
        logger.info("Features saved to %s", path)
    return out


def test_detection(cfg, state, model, mesh):
    """AVA detection eval through the AVAMeter protocol
    (`test_net.py` AVAMeter path + `ava_eval_helper.py`): label-map
    whitelist, excluded timestamps, groundtruth CSV; falls back to
    batch-derived groundtruth when no GROUNDTRUTH_FILE is shipped
    (synthetic/smoke datasets)."""
    from collections import defaultdict

    test_loader = loader_mod.construct_loader(cfg, "test")
    preprocess = steps.make_eval_preprocess_fn(cfg)

    @jax.jit
    def det_step(state, frames, boxes, box_mask):
        x = preprocess(frames)
        inputs = steps.pack_pathways(cfg, x)
        xs = inputs[0] if len(inputs) == 1 else inputs
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return model.apply(
            variables, xs, train=False, boxes=boxes, box_mask=box_mask
        )

    video_idx_to_name = getattr(test_loader.dataset, "_video_names", None)
    meter = meters_mod.AVAMeter(
        len(test_loader), cfg, mode="test",
        video_idx_to_name=video_idx_to_name,
    )
    have_gt_file = meter.full_groundtruth is not None
    gt_boxes_d = defaultdict(list)
    gt_labels_d = defaultdict(list)
    gt_scores_d = defaultdict(list)

    from pmv_tpu.utils.ava_eval import make_image_key

    meter.iter_tic()
    for cur_iter, batch in enumerate(test_loader):
        meter.data_toc()
        scores = np.asarray(
            jax.device_get(
                det_step(
                    state, batch["frames"], batch["boxes"], batch["box_mask"]
                )
            ),
            dtype=np.float32,
        )
        mask = np.asarray(batch["box_mask"], bool)  # [B, M]
        b_idx, m_idx = np.nonzero(mask)
        preds = scores[b_idx, m_idx]  # [K, C]
        ori = np.asarray(batch["ori_boxes"], np.float32)[b_idx, m_idx]
        metadata = np.asarray(batch["metadata"])[b_idx]  # [K, 2]
        preds, ori, metadata = _allgather_if_multihost(
            [preds, ori, metadata]
        )
        meter.iter_toc()
        meter.update_stats(preds, ori, metadata)
        if not have_gt_file:
            # Batch-derived groundtruth in AVA dict format (detection
            # labels are 1-based action ids).
            labels_hot = np.asarray(batch["labels"], np.float32)[b_idx, m_idx]
            for k in range(len(b_idx)):
                m = metadata[k] if metadata.ndim == 2 else metadata
                name = (
                    video_idx_to_name[int(m[0])]
                    if video_idx_to_name is not None
                    else str(int(m[0]))
                )
                key = make_image_key(name, int(m[1]))
                y1, x1, y2, x2 = ori[k][[1, 0, 3, 2]]
                for c in np.nonzero(labels_hot[k])[0]:
                    gt_boxes_d[key].append([y1, x1, y2, x2])
                    gt_labels_d[key].append(int(c) + 1)
                    gt_scores_d[key].append(1.0)
        meter.log_iter_stats(None, cur_iter)
        meter.iter_tic()

    groundtruth = (
        None if have_gt_file else (gt_boxes_d, gt_labels_d, gt_scores_d)
    )
    mean_ap = meter.finalize_metrics(log=False, groundtruth=groundtruth)
    logger.info("AVA mAP: %.4f", mean_ap)
    pmv_logging.log_json_stats(
        {"split": "test_final", "map": mean_ap}, logger
    )
    return {"map": mean_ap}


def test_one(cfg, state, model, model_port, mesh, rel_ratio=None):
    test_loader = loader_mod.construct_loader(cfg, "test")
    logger.info("Testing model for %d iterations", len(test_loader))

    assert len(test_loader.dataset) % (
        cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    ) == 0, "test set size must divide by the view protocol"
    num_videos = len(test_loader.dataset) // (
        cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    )
    test_meter = meters_mod.TestMeter(
        num_videos,
        cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS,
        cfg.MODEL.NUM_CLASSES,
        len(test_loader),
        multi_label=cfg.DATA.MULTI_LABEL,
        ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
    )

    eval_step = jax.jit(steps.make_eval_step(cfg, model))
    eval_step_pm = (
        jax.jit(_make_pm_eval_step(cfg, model, model_port))
        if model_port is not None
        else None
    )
    test_meter, stats = perform_test(
        test_loader, eval_step, eval_step_pm, state, test_meter, cfg, mesh
    )

    if cfg.TEST.SAVE_RESULTS_PATH and jax.process_index() == 0:
        tag = "" if rel_ratio is None else f"_r{rel_ratio[0]:.2f}x{rel_ratio[1]:.2f}"
        save_path = os.path.join(
            cfg.OUTPUT_DIR, cfg.TEST.SAVE_RESULTS_PATH + tag
        )
        with open(save_path, "wb") as f:
            pickle.dump(
                {
                    "video_preds": test_meter.video_preds,
                    "video_labels": test_meter.video_labels,
                },
                f,
            )
        logger.info("Testing results saved to %s", save_path)
    return stats


def visualize_mask_reconstruction(cfg, model, test_loader, example, rng):
    """VIS_MASK.ENABLE: MAE (original | masked | reconstructed) comparisons
    (`test_net.py:140` + `masked.py:505-535`), written to TensorBoard and
    OUTPUT_DIR as .npy."""
    import jax.numpy as jnp

    from pmv_tpu.engine import ssl_steps
    from pmv_tpu.models.masked import mae_visualize
    from pmv_tpu.utils import checkpoint as cu_mod

    state, _ = ssl_steps.init_masked_state(cfg, model, example, rng)
    state = cu_mod.load_test_checkpoint(cfg, state)

    writer = None
    if cfg.TENSORBOARD.ENABLE:
        from pmv_tpu.visualization.tensorboard_vis import TensorboardWriter

        writer = TensorboardWriter(cfg)
    out_paths = []
    for cur_iter, batch in enumerate(test_loader):
        x = jnp.asarray(batch["frames"].astype(np.float32))
        pred, _, mask = model.apply(
            {"params": state.params}, x, train=False,
            rngs={"mask": jax.random.fold_in(rng, cur_iter)},
        )
        comp = np.asarray(mae_visualize(cfg, x, pred, mask))
        path = os.path.join(cfg.OUTPUT_DIR, f"vis_mask_{cur_iter:04d}.npy")
        np.save(path, comp)
        out_paths.append(path)
        if writer is not None:
            b, three, t, h, w, c = comp.shape
            writer.add_video(
                comp.reshape(b * three, t, h, w, c)[:6],
                tag="mae_reconstruction", global_step=cur_iter,
            )
        if cur_iter >= 3:  # bounded visualization sweep
            break
    if writer is not None:
        writer.close()
    logger.info("VIS_MASK wrote %d comparison stacks", len(out_paths))
    return out_paths


def test(cfg):
    """Multi-view test entry (mirrors `tools/test_net.py` test)."""
    pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    logger.info("Test with config:")
    logger.info(pprint.pformat(cfg))
    cfg = cfg.clone()
    cfg.TEST.PROCESS = True

    mesh = mesh_lib.create_mesh(cfg)
    rng = misc.root_key(cfg)
    model = build_model(cfg)
    needs_pm = cfg.DATA.TEST_CROP_SIZE_RECT_SWITCH_AUTO
    model_port = build_model(cfg, hw_switch=True) if needs_pm else None

    # Init from one test batch's geometry.
    test_loader = loader_mod.construct_loader(cfg, "test")
    example = next(iter(test_loader))
    if cfg.VIS_MASK.ENABLE and cfg.MODEL.MODEL_NAME == "MaskMViT":
        return visualize_mask_reconstruction(
            cfg, model, test_loader, example, rng
        )
    if cfg.DETECTION.ENABLE:
        import jax.numpy as jnp

        from pmv_tpu.engine.train_state import TrainState
        from pmv_tpu.models import optimizer as optim

        x = example["frames"].astype(np.float32)
        inputs = steps.pack_pathways(cfg, x)
        xs = inputs[0] if len(inputs) == 1 else inputs
        variables = jax.jit(
            lambda k: model.init(
                k, xs, train=False,
                boxes=jnp.asarray(example["boxes"]),
                box_mask=jnp.asarray(example["box_mask"]),
            )
        )(rng)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=None,
        )
    else:
        state, _ = steps.init_state(
            cfg, model,
            {"frames": example["frames"], "labels": example["labels"]},
            rng,
        )
    if cfg.LOG_MODEL_INFO:
        misc.log_model_info(
            state, cfg,
            model=None if cfg.DETECTION.ENABLE else model,
            example_batch={"frames": example["frames"]},
        )
    state = cu.load_test_checkpoint(cfg, state)
    state = mesh_lib.replicate(state, mesh, cfg.TPU.SHARD_STRATEGY)

    if cfg.DETECTION.ENABLE:
        return test_detection(cfg, state, model, mesh)

    if cfg.TEST.FEAT_EXTRACT:
        return extract_features(cfg, state, model, mesh)

    if cfg.TEST.DENSE_SPATIAL_CROP:
        # Ratio-grid sweep (`test_net.py:358-379`).
        n = cfg.TEST.DENSE_SPATIAL_CROP_STEPS
        grid = np.linspace(0, 1, n)
        all_stats = []
        for rh in grid:
            for rw in grid:
                sweep_cfg = cfg.clone()
                sweep_cfg.TEST.SPATIAL_SAMPLE_INDEX = -2
                sweep_cfg.TEST.SPATIAL_SAMPLE_RATIO = [float(rh), float(rw)]
                sweep_cfg.TEST.NUM_SPATIAL_CROPS = 1
                all_stats.append(
                    test_one(sweep_cfg, state, model, model_port, mesh,
                             rel_ratio=(rh, rw))
                )
        return all_stats
    return test_one(cfg, state, model, model_port, mesh)
