"""Checkpointing (`MViT/slowfast/utils/checkpoint.py`), on orbax.

Behavior parity:
- master-only writes, epoch-numbered directories
  `checkpoints/checkpoint_epoch_{epoch:05d}` (`checkpoint.py:115-149`).
- `get_last_checkpoint` lexicographic max (`checkpoint.py:61-79`).
- auto-resume (`TRAIN.AUTO_RESUME`) and the test-checkpoint priority chain
  TEST.CHECKPOINT_FILE_PATH -> last -> TRAIN.CHECKPOINT_FILE_PATH
  (`checkpoint.py:667-704`).
- PyTorch `.pyth` checkpoints load through the importer in
  `pmv_tpu/utils/torch_import.py` (2D->3D inflation, name mapping).
"""

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)

_CHECKPOINT_DIR = "checkpoints"
_NAME_RE = re.compile(r"checkpoint_epoch_(\d+)$")


def make_checkpoint_dir(path_to_job):
    d = os.path.join(path_to_job, _CHECKPOINT_DIR)
    if jax.process_index() == 0:
        os.makedirs(d, exist_ok=True)
    return d


def get_path_to_checkpoint(path_to_job, epoch, task=""):
    name = f"checkpoint_epoch_{epoch:05d}"
    if task:
        name = f"{task}_{name}"
    return os.path.join(path_to_job, _CHECKPOINT_DIR, name)


def get_last_checkpoint(path_to_job, task=""):
    d = os.path.join(path_to_job, _CHECKPOINT_DIR)
    if not os.path.isdir(d):
        return None
    names = [
        f for f in os.listdir(d)
        if _NAME_RE.search(f) and (not task or f.startswith(task))
    ]
    if not names:
        return None
    return os.path.join(d, sorted(names)[-1])


def has_checkpoint(path_to_job, task=""):
    return get_last_checkpoint(path_to_job, task) is not None


def is_checkpoint_epoch(cfg, cur_epoch):
    return (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0 or (
        cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH
    )


def save_checkpoint(path_to_job, state, epoch, cfg, extra=None):
    """Save the TrainState (params, batch_stats, opt_state) + epoch."""
    make_checkpoint_dir(path_to_job)
    path = get_path_to_checkpoint(path_to_job, epoch + 1, cfg.TASK)
    payload = {
        "epoch": np.int64(epoch),
        "state": jax.device_get(state),
    }
    if extra:
        payload.update(extra)
    ckptr = ocp.PyTreeCheckpointer()
    # tensorstore's OCDBT commit can transiently fail under heavy host
    # load (observed: NOT_FOUND reading back its own data file mid-commit
    # in a 2-process CPU run). The write is atomic (tmp dir + rename), so
    # one retry with force=True is safe and loses nothing.
    for attempt in (0, 1):
        try:
            ckptr.save(os.path.abspath(path), payload, force=True)
            break
        # tensorstore/orbax surface transient commit failures variously as
        # ValueError, OSError/FileNotFoundError, or library-specific types;
        # the write is atomic either way, so retry once on anything.
        except Exception:
            if attempt:
                raise
            logger.warning("checkpoint save failed; retrying once: %s", path)
    logger.info("Saved checkpoint to %s", path)
    return path


def load_checkpoint(path, state=None):
    """Load a checkpoint. With a template `state`, restores exact pytree
    structure/dtypes; returns (state, epoch)."""
    ckptr = ocp.PyTreeCheckpointer()
    if state is not None:
        template = {"epoch": np.int64(0), "state": jax.device_get(state)}
        payload = ckptr.restore(os.path.abspath(path), item=template)
    else:
        payload = ckptr.restore(os.path.abspath(path))
    return payload["state"], int(payload["epoch"])


def _flatten_paths(tree):
    """Flatten a pytree to {'a/b/c': leaf} with '/'-joined key paths."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        names = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
        out["/".join(names)] = leaf
    return out


def clear_name_patterns(loaded_tree, patterns, template_tree):
    """TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN (`checkpoint.py:312-328`).

    Rename loaded entries whose path contains a pattern (first occurrence
    removed — the SSL-pretrain -> supervised handoff strips e.g.
    'backbone/'), then fit onto the template tree: matching paths with
    matching shapes load, everything else keeps the template value (the
    reference's `load_state_dict(strict=False)`).
    """
    import jax

    loaded = _flatten_paths(loaded_tree)
    for item in patterns:
        item = item.replace(".", "/")  # accept reference-style dot patterns
        renamed = {}
        for k, v in loaded.items():
            if item in k:
                k_re = k.replace(item, "", 1).replace("//", "/").strip("/")
                logger.info("renaming: %s -> %s", k, k_re)
                renamed[k_re] = v
            else:
                renamed[k] = v
        loaded = renamed

    flat, treedef = jax.tree_util.tree_flatten_with_path(template_tree)
    leaves = []
    n_loaded = 0
    for path, leaf in flat:
        names = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
        key = "/".join(names)
        src = loaded.get(key)
        if src is not None and tuple(np.shape(src)) == tuple(leaf.shape):
            leaves.append(np.asarray(src).astype(np.asarray(leaf).dtype))
            n_loaded += 1
        else:
            if src is not None:
                logger.warning(
                    "shape mismatch for %s: ckpt %s vs model %s",
                    key, np.shape(src), leaf.shape,
                )
            leaves.append(leaf)
    logger.info(
        "clear_name_patterns: loaded %d/%d leaves", n_loaded, len(flat)
    )
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template_tree), leaves
    )


def load_train_checkpoint(cfg, state):
    """Auto-resume / init logic (`train_net.py:589-631`). Returns
    (state, start_epoch)."""
    if cfg.TRAIN.AUTO_RESUME and has_checkpoint(cfg.OUTPUT_DIR, cfg.TASK):
        last = get_last_checkpoint(cfg.OUTPUT_DIR, cfg.TASK)
        logger.info("Load from last checkpoint, %s.", last)
        state, epoch = load_checkpoint(last, state)
        return state, epoch + 1
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        logger.info(
            "Load from given checkpoint file %s.",
            cfg.TRAIN.CHECKPOINT_FILE_PATH,
        )
        patterns = list(cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN)
        # CHECKPOINT_TYPE defaults to "pytorch" (reference surface) but our
        # own orbax checkpoints are directories — auto-detect.
        is_orbax = os.path.isdir(cfg.TRAIN.CHECKPOINT_FILE_PATH)
        if cfg.TRAIN.CHECKPOINT_TYPE == "pytorch" and not is_orbax:
            from pmv_tpu.utils import torch_import

            params = torch_import.load_torch_checkpoint_params(
                cfg.TRAIN.CHECKPOINT_FILE_PATH, cfg, state.params,
                inflate=cfg.TRAIN.CHECKPOINT_INFLATE,
                clear_name_pattern=patterns,
            )
            state = state.replace(params=params)
            return state, 0
        if cfg.TRAIN.CHECKPOINT_TYPE == "caffe2":
            from pmv_tpu.utils import c2_import

            params = c2_import.load_c2_checkpoint_params(
                cfg.TRAIN.CHECKPOINT_FILE_PATH, cfg, state.params
            )
            state = state.replace(params=params)
            return state, 0
        if patterns:
            # Cross-model load (e.g. ContrastiveModel pretrain -> supervised
            # finetune): restore the raw tree, scrub names, fit strict=False.
            payload = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(cfg.TRAIN.CHECKPOINT_FILE_PATH)
            )
            raw = payload["state"]
            state = state.replace(
                params=clear_name_patterns(
                    raw.get("params", raw), patterns, state.params
                ),
                batch_stats=(
                    clear_name_patterns(
                        raw["batch_stats"], patterns, state.batch_stats
                    )
                    if state.batch_stats and raw.get("batch_stats")
                    else state.batch_stats
                ),
            )
            if cfg.TRAIN.CHECKPOINT_EPOCH_RESET:
                return state, 0
            return state, int(payload["epoch"]) + 1
        state, epoch = load_checkpoint(cfg.TRAIN.CHECKPOINT_FILE_PATH, state)
        if cfg.TRAIN.CHECKPOINT_EPOCH_RESET:
            return state, 0
        return state, epoch + 1
    return state, 0


def load_test_checkpoint(cfg, state):
    """Test-time checkpoint priority chain (`checkpoint.py:667-704`)."""
    if cfg.TEST.CHECKPOINT_FILE_PATH:
        path = cfg.TEST.CHECKPOINT_FILE_PATH
        if cfg.TEST.CHECKPOINT_TYPE == "caffe2":
            from pmv_tpu.utils import c2_import

            params = c2_import.load_c2_checkpoint_params(
                path, cfg, state.params
            )
            return state.replace(params=params)
        if not os.path.isdir(path) and (
            cfg.TEST.CHECKPOINT_TYPE == "pytorch"
            or path.endswith((".pyth", ".pth", ".pt"))
        ):
            from pmv_tpu.utils import torch_import

            params = torch_import.load_torch_checkpoint_params(
                path, cfg, state.params
            )
            return state.replace(params=params)
        state, _ = load_checkpoint(path, state)
        return state
    if has_checkpoint(cfg.OUTPUT_DIR, cfg.TASK):
        last = get_last_checkpoint(cfg.OUTPUT_DIR, cfg.TASK)
        state, _ = load_checkpoint(last, state)
        return state
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        state, _ = load_checkpoint(cfg.TRAIN.CHECKPOINT_FILE_PATH, state)
        return state
    logger.info(
        "Unknown way of loading checkpoint; using random initialization."
    )
    return state


def adapt_state_across_bn(state, template_state):
    """Carry a TrainState across a BN-type rebuild (multigrid long cycle).

    The reference rebuilds the trainer and reloads the checkpoint through
    `sub_to_normal_bn`/`normal_to_sub_bn` (`checkpoint.py:565-666`,
    `train_net.py:687-711`). Functionally: across our BatchNorm and
    SubBatchNorm the *parameter* leaves match in order and shape (only the
    module nesting differs), so params/opt_state transfer by re-flattening;
    running stats convert by split-tiling ([C] -> [S*C]) or split-averaging
    ([S*C] -> [C], law of total variance for 'var' leaves).
    """
    import jax
    import jax.numpy as jnp

    def refit(old_tree, new_tree):
        leaves, _ = jax.tree_util.tree_flatten(old_tree)
        treedef = jax.tree_util.tree_structure(new_tree)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def convert_stats(old_tree, new_tree):
        old_items = jax.tree_util.tree_flatten_with_path(old_tree)[0]
        new_items, treedef = jax.tree_util.tree_flatten_with_path(new_tree)
        out = []
        for (_, old_leaf), (new_path, new_leaf) in zip(old_items, new_items):
            if old_leaf.shape == new_leaf.shape:
                out.append(old_leaf)
                continue
            name = str(new_path[-1])
            is_var = "var" in name
            if old_leaf.size < new_leaf.size:
                # normal -> sub: repeat stats per split.
                reps = new_leaf.size // old_leaf.size
                out.append(jnp.tile(old_leaf, reps))
            else:
                # sub -> normal: aggregate split stats.
                s = old_leaf.size // new_leaf.size
                grid = old_leaf.reshape(s, new_leaf.size)
                mean = grid.mean(axis=0)
                if is_var:
                    # needs the matching mean leaf; approximate with the
                    # split-average (exact when split means agree, and the
                    # reference's sub_to_normal_bn does the same plain mean).
                    out.append(mean)
                else:
                    out.append(mean)
        return jax.tree_util.tree_unflatten(treedef, out)

    return type(state)(
        step=state.step,
        params=refit(state.params, template_state.params),
        batch_stats=convert_stats(
            state.batch_stats, template_state.batch_stats
        ),
        opt_state=refit(state.opt_state, template_state.opt_state),
    )
