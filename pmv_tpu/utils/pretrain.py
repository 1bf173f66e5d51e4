"""UniFormer pretrain registry (`Uniformer/slowfast/models/uniformer.py:16-29`
+ `get_pretrained_model` at `:440-463`, auto-loaded by the fork's
`build.py:42-46`).

Name -> checkpoint path under a configurable root:
- $PMV_PRETRAIN_ROOT when set,
- else the reference's bytenas mount f"/mnt/bn/$BYTENAS_VOLUME_NAME/
  pretrained_model" when that env var is set.

Loading goes through the torch importer (2D->3D average inflation for
image-pretrained checkpoints, head dropped on class-count mismatch — the
reference's `inflate_weight` / `head.weight` deletion).
"""

import os

from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)

_NAMES = [
    "uniformer_small_in1k",
    "uniformer_small_k400_8x8",
    "uniformer_small_k400_16x4",
    "uniformer_small_pm_k400_16x4",
    "uniformer_small_k600_16x4",
    "uniformer_base_in1k",
    "uniformer_base_k400_8x8",
    "uniformer_base_k400_16x4",
    "uniformer_base_k600_16x4",
    "uniformer_base_k600_32x4",
]


def pretrain_root():
    root = os.environ.get("PMV_PRETRAIN_ROOT", "")
    if root:
        return root
    vol = os.environ.get("BYTENAS_VOLUME_NAME", "")
    if vol:
        return f"/mnt/bn/{vol}/pretrained_model"
    return ""


def model_paths():
    root = pretrain_root()
    return {name: os.path.join(root, f"{name}.pth") for name in _NAMES}


def resolve(name):
    """Registry name or direct path -> checkpoint path."""
    if os.path.exists(name):
        return name
    paths = model_paths()
    if name in paths:
        return paths[name]
    raise KeyError(
        f"unknown pretrain '{name}' (registry: {sorted(paths)}; "
        f"set $PMV_PRETRAIN_ROOT or pass a path)"
    )


def load_pretrained_params(cfg, params):
    """Load cfg.UNIFORMER.PRETRAIN_NAME into a param tree (returns params
    unchanged when unset)."""
    name = cfg.UNIFORMER.PRETRAIN_NAME
    if not name:
        return params
    path = resolve(name)
    logger.info("Loading UniFormer pretrain '%s' from %s", name, path)
    from pmv_tpu.utils import torch_import

    return torch_import.load_torch_checkpoint_params(path, cfg, params)
