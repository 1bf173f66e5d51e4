#!/usr/bin/env python3
"""Model visualization entry (`MViT/tools/visualization.py:29-345`):
Grad-CAM maps + prediction dumps over the test set, written to TensorBoard
and (optionally) annotated videos.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def visualize(cfg):
    import jax

    from pmv_tpu.data import loader as loader_mod
    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    from pmv_tpu.utils import checkpoint as cu
    from pmv_tpu.utils import logging as pmv_logging
    from pmv_tpu.visualization.gradcam import gradcam
    from pmv_tpu.visualization.tensorboard_vis import TensorboardWriter

    logger = pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    cfg = cfg.clone()
    cfg.TEST.PROCESS = True

    # Offline class-level plots from pickled test predictions
    # (`tools/visualization.py:293-302`).
    if cfg.TENSORBOARD.PREDICTIONS_PATH:
        import pickle

        writer = TensorboardWriter(cfg)
        with open(cfg.TENSORBOARD.PREDICTIONS_PATH, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, dict):  # our test() dump format (engine/test.py)
            preds, labels = obj["video_preds"], obj["video_labels"]
        else:  # reference format: (preds, labels) tuple
            preds, labels = obj
        writer.plot_eval(np.asarray(preds), np.asarray(labels), global_step=0)
        writer.close()
        if not (
            cfg.TENSORBOARD.MODEL_VIS.ENABLE
            or cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE
        ):
            return
    model = build_model(cfg, dtype=None)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    test_loader = loader_mod.construct_loader(cfg, "test")
    example = next(iter(test_loader))
    state, _ = steps.init_state(
        cfg, model,
        {"frames": example["frames"], "labels": example["labels"]}, rng,
    )
    state = cu.load_test_checkpoint(cfg, state)
    writer = TensorboardWriter(cfg)

    import jax.numpy as jnp

    preprocess = steps.make_eval_preprocess_fn(cfg)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    mv = cfg.TENSORBOARD.MODEL_VIS

    # Weight histograms by layer prefix (`tensorboard_vis.py`
    # plot_weights_and_activations; LAYER_LIST empty = all layers).
    if mv.ENABLE and mv.MODEL_WEIGHTS:
        import jax as _jax

        flat = _jax.tree_util.tree_flatten_with_path(state.params)[0]
        for path, leaf in flat:
            name = "/".join(str(k.key) for k in path)
            if mv.LAYER_LIST and not any(
                name.startswith(l) for l in mv.LAYER_LIST
            ):
                continue
            writer.add_histogram(f"weights/{name}", leaf, global_step=0)

    use_gradcam = not mv.ENABLE or mv.GRAD_CAM.ENABLE
    all_preds, all_labels = [], []
    for cur_iter, batch in enumerate(test_loader):
        x = np.asarray(preprocess(batch["frames"]))
        if use_gradcam:
            labels_for_cam = (
                jnp.asarray(batch["labels"])
                if (mv.ENABLE and mv.GRAD_CAM.USE_TRUE_LABEL)
                else None
            )
            maps, preds = gradcam(
                model, variables, jnp.asarray(x), target_labels=labels_for_cam
            )
        else:
            inputs = jnp.asarray(x)
            preds = model.apply(variables, inputs, train=False)
        preds = np.asarray(preds)
        all_preds.append(preds)
        all_labels.append(batch["labels"])
        if cur_iter == 0 and (not mv.ENABLE or mv.INPUT_VIDEO):
            writer.add_video(batch["frames"], tag="Input", global_step=0)
        # Wrong-prediction videos (`visualization.py` WRONG_PRED_VIS path).
        if cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE:
            wrong = np.argmax(preds, axis=-1) != np.asarray(batch["labels"])
            if wrong.any():
                writer.add_video(
                    batch["frames"][wrong][:4],
                    tag=cfg.TENSORBOARD.WRONG_PRED_VIS.TAG,
                    global_step=cur_iter,
                )
        if cur_iter >= 4:  # visualization sweep is bounded by design
            break
    writer.plot_eval(
        np.concatenate(all_preds), np.concatenate(all_labels), global_step=0
    )
    writer.close()


def main():
    from pmv_tpu.config.defaults import assert_and_infer_cfg
    from pmv_tpu.config.parser import load_config, parse_args

    args = parse_args()
    for path_to_config in args.cfg_files or []:
        cfg = load_config(args, path_to_config)
        cfg = assert_and_infer_cfg(cfg)
        visualize(cfg)


if __name__ == "__main__":
    main()
