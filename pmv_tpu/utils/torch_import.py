"""PyTorch checkpoint importer.

Loads the reference's released `.pyth`/`.pth` checkpoints into our flax
param trees (`MViT/slowfast/utils/checkpoint.py:191-563` load semantics):
name mapping, Linear/Conv layout transposition, 2D->3D kernel inflation
(`checkpoint.py:152-188`, `uniformer.py:429-440`), and head-drop on
class-count mismatch.

Layout conversions (torch -> flax, channels-last):
- Linear weight [out, in]            -> kernel [in, out]
- Conv3d weight [O, I, T, H, W]      -> kernel [T, H, W, I, O]
- Conv2d weight [O, I, H, W]         -> inflated [T, H, W, I, O] when the
  flax kernel is 5-D (divide by T — average inflation, `uniformer.py:437`).
- BN weight/bias/running_mean/running_var -> scale/bias + batch_stats
  mean/var.

Name mapping: flax paths already mirror torch module names ("blocks.3/attn/
qkv/kernel" -> "blocks.3.attn.qkv.weight"); the exceptions (MViT pool norms)
are handled explicitly.
"""

import re

import numpy as np

from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)

_LEAF_MAP = {
    "kernel": "weight",
    "pool_kernel": "weight",  # AttentionPool's folded depthwise kernel
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def _flax_path_to_torch(path_names):
    """Map a flax param path to the torch state-dict name."""
    names = list(path_names)
    leaf = names[-1]
    mods = names[:-1]
    out = []
    i = 0
    while i < len(mods):
        m = mods[i]
        # MViT attention pools: attn/pool_q(.pool_kernel) -> attn.pool_q;
        # attn/pool_q/norm -> attn.norm_q.
        if m in ("pool_q", "pool_k", "pool_v"):
            if i + 1 < len(mods) and mods[i + 1] == "norm":
                out.append("norm_" + m.split("_")[1])
                i += 2
                continue
            out.append(m)
            i += 1
            continue
        # ResNet-family stages: reference ResStage registers children as
        # "pathway{P}_res{i}" / "pathway{P}_nonlocal{i}"
        # (`resnet_helper.py:688,698`), so our nested
        # "sK.pathwayP"/"resI" path joins with an underscore.
        if (
            out
            and re.fullmatch(r"s\d+\.pathway\d+", out[-1])
            and re.fullmatch(r"(res|nonlocal)\d+", m)
        ):
            out[-1] = out[-1] + "_" + m
            i += 1
            continue
        # Our BatchNorm wrapper delegates to an anonymous inner
        # flax nn.BatchNorm ("BatchNorm_0"); torch has no such level.
        if re.fullmatch(r"BatchNorm_\d+", m):
            i += 1
            continue
        # flax BatchNorm running stats live under .../bn/batch_stats paths
        # with same module name — nothing to rewrite.
        out.append(m)
        i += 1
    return ".".join(out + [_LEAF_MAP.get(leaf, leaf)])


def _convert_tensor(torch_arr, flax_shape, name, leaf="kernel"):
    """Convert a torch tensor layout to the expected flax shape.

    Decisions are driven by the flax leaf kind ('kernel' always transposes)
    so square weight matrices are never silently passed through.
    """
    arr = np.asarray(torch_arr)
    if leaf in ("kernel", "pool_kernel"):
        if arr.ndim == 2 and len(flax_shape) == 2:
            t = arr.T
            if t.shape == tuple(flax_shape):
                return t
        if arr.ndim == 5 and len(flax_shape) == 5:
            # torch [O, I/groups, T, H, W] -> flax [T, H, W, I/groups, O]
            # (covers depthwise [C,1,t,h,w] -> [t,h,w,1,C] too).
            t = arr.transpose(2, 3, 4, 1, 0)
            if t.shape == tuple(flax_shape):
                return t
        if arr.ndim == 4 and len(flax_shape) == 5:
            # 2D -> 3D inflation: tile over T, normalize (`checkpoint.py:170`).
            t_dim = flax_shape[0]
            t = arr.transpose(2, 3, 1, 0)  # [H, W, I, O]
            t = np.repeat(t[None], t_dim, axis=0) / float(t_dim)
            if t.shape == tuple(flax_shape):
                return t
        if arr.ndim == 4 and len(flax_shape) == 4:
            t = arr.transpose(2, 3, 1, 0)
            if t.shape == tuple(flax_shape):
                return t
    else:
        if tuple(arr.shape) == tuple(flax_shape):
            return arr
        if arr.size == int(np.prod(flax_shape)):
            return arr.reshape(flax_shape)
    raise ValueError(
        f"cannot convert {name}: torch {arr.shape} -> flax {flax_shape} "
        f"(leaf {leaf})"
    )


def load_torch_state_dict(path):
    """Load a torch checkpoint file -> flat numpy state dict."""
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state", "model", "state_dict"):
        if isinstance(checkpoint, dict) and key in checkpoint:
            checkpoint = checkpoint[key]
            break
    return {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in checkpoint.items()
    }


def convert_state_dict(state_dict, variables, strict=True, drop_head_mismatch=True):
    """Fill a flax variables tree {'params':..., 'batch_stats':...} from a
    torch state dict. Returns (new_variables, missing, unexpected)."""
    import jax

    used = set()
    missing = []

    def fill(tree, prefix_kind):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, leaf in flat:
            names = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
            torch_name = _flax_path_to_torch(names)
            key = tuple(names)
            if torch_name in state_dict:
                try:
                    arr = _convert_tensor(
                        state_dict[torch_name], leaf.shape, torch_name,
                        leaf=names[-1],
                    )
                    used.add(torch_name)
                except ValueError as e:
                    if drop_head_mismatch and (
                        "head" in torch_name or "projection" in torch_name
                    ):
                        logger.info("Dropping %s (shape mismatch)", torch_name)
                        arr = np.asarray(leaf)
                        used.add(torch_name)
                    else:
                        raise
                out[key] = arr.astype(np.asarray(leaf).dtype)
            else:
                missing.append(torch_name)
                out[key] = np.asarray(leaf)
        return out

    def rebuild(tree, filled):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in flat:
            names = tuple(
                str(k.key) if hasattr(k, "key") else str(k) for k in path
            )
            leaves.append(filled[names])
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), leaves
        )

    new_vars = {}
    for kind, tree in variables.items():
        if not tree:
            new_vars[kind] = tree
            continue
        filled = fill(tree, kind)
        new_vars[kind] = rebuild(tree, filled)

    unexpected = [k for k in state_dict if k not in used]
    if missing:
        logger.warning("Missing from torch ckpt: %s ...", missing[:10])
    if unexpected:
        logger.info("Unused torch keys: %s ...", unexpected[:10])
    if strict and missing:
        raise KeyError(f"{len(missing)} params missing from checkpoint")
    return new_vars, missing, unexpected


def load_torch_checkpoint_params(
    path, cfg, params, inflate=False, clear_name_pattern=()
):
    """Load torch checkpoint params only (no batch stats) into `params`.

    clear_name_pattern: substrings removed (first occurrence) from torch
    state-dict keys before name matching
    (`checkpoint.py:312-328` TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN).
    """
    sd = load_torch_state_dict(path)
    for item in clear_name_pattern:
        renamed = {}
        for k, v in sd.items():
            if item in k:
                k_re = k.replace(item, "", 1)
                logger.info("renaming: %s -> %s", k, k_re)
                renamed[k_re] = v
            else:
                renamed[k] = v
        sd = renamed
    new_vars, _, _ = convert_state_dict(
        sd, {"params": params}, strict=False
    )
    return new_vars["params"]
