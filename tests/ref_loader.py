"""Import the REFERENCE PyTorch slowfast models (/root/reference) for
logit-parity tests.

Both forks ship a package named `slowfast`, so switching forks clears the
previously-imported modules. The dataset zoo (av/decord/cv2 pipelines) is
bypassed by pre-registering a minimal `slowfast.datasets.utils` — the model
code only needs `pack_pathway_output` from it. Missing third-party deps
(iopath/fvcore/pytorchvideo/detectron2/torchvision/timm) come from
tests/ref_stubs.
"""

import os
import sys
import types

STUBS = os.path.join(os.path.dirname(__file__), "ref_stubs")
REFERENCE = "/root/reference"


def _pack_pathway_output(cfg, frames):
    """`slowfast/datasets/utils.py` pack_pathway_output (torch)."""
    import torch

    if cfg.DATA.REVERSE_INPUT_CHANNEL:
        frames = frames[[2, 1, 0], :, :, :]
    if cfg.MODEL.ARCH in cfg.MODEL.SINGLE_PATHWAY_ARCH:
        return [frames]
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        fast_pathway = frames
        slow_pathway = torch.index_select(
            frames, 1,
            torch.linspace(
                0, frames.shape[1] - 1,
                frames.shape[1] // cfg.SLOWFAST.ALPHA,
            ).long(),
        )
        return [slow_pathway, fast_pathway]
    raise NotImplementedError(cfg.MODEL.ARCH)


def import_reference_models(fork="MViT"):
    """Returns the reference fork's `slowfast.models` module."""
    for k in list(sys.modules):
        if k == "slowfast" or k.startswith("slowfast."):
            del sys.modules[k]
    sys.path[:] = [
        p for p in sys.path if not p.startswith(REFERENCE)
    ]
    if STUBS not in sys.path:
        sys.path.insert(0, STUBS)
    sys.path.insert(0, os.path.join(REFERENCE, fork))

    ds_pkg = types.ModuleType("slowfast.datasets")
    ds_utils = types.ModuleType("slowfast.datasets.utils")
    ds_utils.pack_pathway_output = _pack_pathway_output
    ds_pkg.utils = ds_utils
    sys.modules["slowfast.datasets"] = ds_pkg
    sys.modules["slowfast.datasets.utils"] = ds_utils

    # Uniformer/slowfast/models/uniformer.py:16 builds a pretrain path from
    # this env var at import time.
    os.environ.setdefault("BYTENAS_VOLUME_NAME", "unused")

    import slowfast.models as models  # noqa

    return models


def import_reference_data(fork="MViT"):
    """Returns the reference fork's REAL data-path modules
    (decoder, utils, spatial transform) for full-pipeline golden tests.

    `slowfast.datasets.__init__` imports the dataset zoo (needs av/decord),
    so the package is registered bare with `__path__` pointing at the real
    directory and only the torch-math submodules are imported (their
    torchvision/PIL deps come from tests/ref_stubs). Returns
    (decoder, utils, transform) modules
    (`MViT/slowfast/datasets/{decoder,utils,transform}.py`)."""
    import importlib

    for k in list(sys.modules):
        if k == "slowfast" or k.startswith("slowfast."):
            del sys.modules[k]
    sys.path[:] = [p for p in sys.path if not p.startswith(REFERENCE)]
    if STUBS not in sys.path:
        sys.path.insert(0, STUBS)
    sys.path.insert(0, os.path.join(REFERENCE, fork))

    import slowfast  # noqa: F401  (env setup via iopath stub)

    ds_dir = os.path.join(REFERENCE, fork, "slowfast", "datasets")
    ds_pkg = types.ModuleType("slowfast.datasets")
    ds_pkg.__path__ = [ds_dir]
    sys.modules["slowfast.datasets"] = ds_pkg

    transform = importlib.import_module("slowfast.datasets.transform")
    decoder = importlib.import_module("slowfast.datasets.decoder")
    utils = importlib.import_module("slowfast.datasets.utils")
    return decoder, utils, transform


def reference_cfg(fork="MViT"):
    """The reference fork's own default cfg (fvcore-free: both forks'
    config/defaults.py only need CfgNode from fvcore, which the stub
    provides via yacs-like attribute access from our own CfgNode)."""
    # Use our config tree: it carries every key the reference models read
    # (validated key-surface parity, tests/test_config_zoo.py).
    from pmv_tpu.config import get_cfg

    return get_cfg()
