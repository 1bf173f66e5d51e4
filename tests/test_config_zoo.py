"""Every shipped config must build and initialize its model.

Parsing alone misses builder-level mismatches (arch names, NONLOCAL
structures, per-depth pool tables), so each config's model is initialized
once at a shrunken spatial size (the temporal/depth geometry is kept,
since pool/stride tables are depth-indexed).
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from pmv_tpu.config import assert_and_infer_cfg, get_cfg
from pmv_tpu.models import build_model

ROOT = os.path.join(os.path.dirname(__file__), "..")
CONFIGS = sorted(
    p
    for p in glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml"),
                       recursive=True)
    # audio-visual / detection configs need different example inputs;
    # they are exercised by their own dedicated tests. ImageNet/in1k
    # configs run as single-frame (2-D patch) models below.
    if "AVSLOWFAST" not in p and "AVA" + os.sep not in p
)


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p)[:-5] for p in CONFIGS]
)
def test_shipped_config_model_initializes(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg = assert_and_infer_cfg(cfg)
    # Shrink the spatial footprint only; keep temporal + depth geometry.
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_CROP_SIZE_RECT = []
    cfg.DATA.TEST_CROP_SIZE_RECT = []
    model = build_model(cfg, dtype=jnp.float32)
    t = cfg.DATA.NUM_FRAMES
    x = jnp.zeros((1, t, 32, 32, 3))
    if cfg.MODEL.MODEL_NAME == "MaskMViT":
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "mask": jax.random.PRNGKey(1)}, x, train=False,
        )
        assert "params" in variables
        return
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        from pmv_tpu.engine import ssl_steps

        state, _ = ssl_steps.init_ssl_state(
            cfg, model,
            {"frames": jnp.zeros((2, t, 32, 32, 3), jnp.uint8),
             "labels": jnp.zeros((2,), jnp.int32)},
            jax.random.PRNGKey(0),
        )
        assert state.params
        return
    from pmv_tpu.engine import steps

    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        inputs = steps.pack_pathways(cfg, x)
        variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    else:
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "params" in variables


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
