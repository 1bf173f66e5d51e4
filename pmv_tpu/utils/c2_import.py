"""Caffe2-legacy checkpoint importer.

The reference can load FAIR's original Caffe2 video-model zoo files
(`TRAIN/TEST.CHECKPOINT_TYPE "caffe2"`): a pickle holding a ``blobs`` dict
of numpy arrays whose names follow the Caffe2 layer convention
(`MViT/slowfast/utils/checkpoint.py:226-294`,
`MViT/slowfast/utils/c2_model_loading.py`). This module maps those blob
names onto the PySlowFast/torch state-dict names our flax importer already
understands, then delegates the layout work (conv transposition, BN splits)
to `pmv_tpu.utils.torch_import.convert_state_dict`.

Name-mapping spec (same rule set as the reference's
``get_name_convert_func``, applied in the same order so chained rewrites
compose identically):

    conv1_w                      -> s1.pathway0_stem.conv.weight
    res_conv1_bn_s               -> s1.pathway0_stem.bn.weight
    res2_0_branch2a_w            -> s2.pathway0_res0.branch2.a.weight
    res2_0_branch1_bn_rm         -> s2.pathway0_res0.branch1_bn.running_mean
    t_res2_0_branch2a_w          -> s2.pathway1_res0.branch2.a.weight  (fast)
    t_pool1_subsample_w          -> s1_fuse.conv_f2s.weight
    t_res2_3_branch2c_bn_subsample_w -> s2_fuse.conv_f2s.weight
    nonlocal_conv3_1_theta_w     -> s3.pathway0_nonlocal1.conv_theta.weight
    pred_b                       -> head.projection.bias
"""

import pickle
import re

import numpy as np

from pmv_tpu.utils import logging as pmv_logging
from pmv_tpu.utils import torch_import

logger = pmv_logging.get_logger(__name__)

# (pattern, replacement) pairs applied sequentially; every rule may rewrite
# the running name, so ordering matters (nonlocal before res, fuse before
# plain fast-pathway, suffix leaf rules last).
_C2_RULES = (
    # Nonlocal blocks: hoist into the stage, name the inner convs.
    (r"^nonlocal_conv(\d+)_(\d+)_(.*)", r"s\1.pathway0_nonlocal\2_\3"),
    (r"^(.*)_nonlocal(\d+)_(theta|phi|g|out)(.*)", r"\1_nonlocal\2.conv_\3\4"),
    (r"^(.*)_nonlocal(\d+)_(bn)_(.*)", r"\1_nonlocal\2.\3.\4"),
    # SlowFast fuse convs (fast->slow 't_' prefixed subsample layers).
    (r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"),
    (r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"),
    (r"^t_res(\d+)_(\d+)_branch2c_bn_subsample_bn_(.*)", r"s\1_fuse.bn.\3"),
    (r"^t_res(\d+)_(\d+)_branch2c_bn_subsample_(.*)",
     r"s\1_fuse.conv_f2s.\3"),
    # Slow/single pathway residual blocks + stem.
    (r"^res(\d+)_(\d+)_branch(\d+)([a-z])_(.*)",
     r"s\1.pathway0_res\2.branch\3.\4_\5"),
    (r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"),
    (r"^conv1_xy(.*)", r"s1.pathway0_stem.conv_xy\1"),
    (r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    (r"^res(\d+)_(\d+)_branch(\d+)_(.*)", r"s\1.pathway0_res\2.branch\3_\4"),
    (r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    # Fast pathway mirrors with a 't_' prefix.
    (r"^t_res(\d+)_(\d+)_branch(\d+)([a-z])_(.*)",
     r"s\1.pathway1_res\2.branch\3.\4_\5"),
    (r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"),
    (r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    (r"^t_res(\d+)_(\d+)_branch(\d+)_(.*)",
     r"s\1.pathway1_res\2.branch\3_\4"),
    (r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    # Heads (classifier, X3D conv_5/lin_5 projection layers, SE fc).
    (r"pred_(.*)", r"head.projection.\1"),
    (r"(.*)b_bn_fc(.*)", r"\1se.fc\2"),
    (r"conv_5(.*)", r"head.conv_5\1"),
    (r"lin_5(.*)", r"head.lin_5\1"),
    # Leaf suffixes: Caffe2 s/b/rm/riv -> torch BN + generic weight/bias.
    (r"(.*)bn.b\Z", r"\1bn.bias"),
    (r"(.*)bn.s\Z", r"\1bn.weight"),
    (r"(.*)bn.rm\Z", r"\1bn.running_mean"),
    (r"(.*)bn.riv\Z", r"\1bn.running_var"),
    (r"(.*)[._]b\Z", r"\1.bias"),
    (r"(.*)[._]w\Z", r"\1.weight"),
)

# Optimizer/bookkeeping blobs that have no model-parameter equivalent.
_SKIP_SUBSTRINGS = ("momentum", "lr", "model_iter")


def convert_c2_name(name):
    """Convert one Caffe2 blob name to its PySlowFast state-dict name."""
    for pattern, repl in _C2_RULES:
        name = re.sub(pattern, repl, name)
    return name


def load_c2_state_dict(path):
    """Read a Caffe2 pickle -> {torch_name: np.ndarray}.

    Caffe2 conv blobs are already [O, I, T, H, W] / FC blobs [out, in] —
    the same layouts torch uses — so no transposition happens here.
    """
    with open(path, "rb") as f:
        payload = pickle.load(f, encoding="latin1")
    blobs = payload["blobs"] if "blobs" in payload else payload
    sd = {}
    for key, value in blobs.items():
        if any(s in key for s in _SKIP_SUBSTRINGS):
            continue
        arr = np.asarray(value)
        if arr.dtype == object or arr.ndim == 0:
            continue
        sd[convert_c2_name(key)] = arr
    return sd


def load_c2_checkpoint_params(path, cfg, params):
    """Load Caffe2 blobs into a flax param tree (params only; Caffe2 zoo
    files carry BN stats fused as bn.rm/riv which land in batch_stats when
    a variables tree is passed through convert_state_dict instead)."""
    sd = load_c2_state_dict(path)
    new_vars, _, _ = torch_import.convert_state_dict(
        sd, {"params": params}, strict=False
    )
    return new_vars["params"]
