"""Importer roundtrips for the UniFormer and X3D families.

Pins the flax<->torch name mapping for every zoo checkpoint family: export
our param tree in torch layout, reimport, require bit equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pmv_tpu.config import get_cfg  # noqa: E402
from pmv_tpu.models import build_model  # noqa: E402
from pmv_tpu.utils import torch_import  # noqa: E402


def _roundtrip(cfg, variables, tmp_path, with_stats=False):
    trees = {"params": variables["params"]}
    if with_stats and variables.get("batch_stats"):
        trees["batch_stats"] = variables["batch_stats"]
    sd = {}
    for kind, tree in trees.items():
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            names = [str(k.key) for k in path]
            tname = torch_import._flax_path_to_torch(names)
            arr = np.asarray(leaf)
            if names[-1] in ("kernel", "pool_kernel") and arr.ndim == 5:
                arr = arr.transpose(4, 3, 0, 1, 2)
            elif names[-1] in ("kernel", "pool_kernel") and arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif names[-1] == "kernel" and arr.ndim == 2:
                arr = arr.T
            assert tname not in sd or np.array_equal(sd[tname], arr), (
                f"name collision: {tname}"
            )
            sd[tname] = torch.from_numpy(np.ascontiguousarray(arr))
    ckpt = tmp_path / "model.pyth"
    torch.save({"model_state": sd}, ckpt)

    new_vars, missing, _ = torch_import.convert_state_dict(
        {k: v.numpy() for k, v in sd.items()}, trees, strict=True
    )
    for kind in trees:
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(trees[kind])[0],
            jax.tree_util.tree_flatten_with_path(new_vars[kind])[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6,
                err_msg=f"{kind}: " + "/".join(str(k.key) for k in p1),
            )


def test_uniformer_roundtrip(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "Uniformer"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.UNIFORMER.EMBED_DIM = [8, 16, 16, 32]
    cfg.UNIFORMER.DEPTH = [1, 1, 1, 1]
    cfg.UNIFORMER.HEAD_DIM = 8
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _roundtrip(cfg, variables, tmp_path, with_stats=True)


def test_x3d_roundtrip(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _roundtrip(cfg, variables, tmp_path, with_stats=True)


def test_pretrain_registry(tmp_path, monkeypatch):
    """UNIFORMER.PRETRAIN_NAME resolves via the registry root and loads
    through the torch importer with head drop (`uniformer.py:16-29,440-463`)."""
    from pmv_tpu.utils import pretrain

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "Uniformer"
    cfg.MODEL.ARCH = "uniformer"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.UNIFORMER.EMBED_DIM = [4, 8, 16, 32]
    cfg.UNIFORMER.DEPTH = [1, 1, 1, 1]
    cfg.UNIFORMER.HEAD_DIM = 8
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # Export as the registry checkpoint (different head size -> head drop).
    import copy

    donor = copy.deepcopy(dict(variables))
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(donor["params"])[0]
    from pmv_tpu.utils import torch_import as ti

    for path, leaf in flat:
        names = [str(k.key) for k in path]
        tname = ti._flax_path_to_torch(names)
        arr = np.asarray(leaf) + 0.25  # distinguishable from init
        if names[-1] in ("kernel", "pool_kernel") and arr.ndim == 5:
            arr = arr.transpose(4, 3, 0, 1, 2)
        elif names[-1] in ("kernel", "pool_kernel") and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif names[-1] == "kernel" and arr.ndim == 2:
            arr = arr.T
        sd[tname] = torch.from_numpy(np.ascontiguousarray(arr))
    root = tmp_path / "pretrained_model"
    root.mkdir()
    torch.save({"model": sd}, root / "uniformer_small_in1k.pth")
    monkeypatch.setenv("PMV_PRETRAIN_ROOT", str(root))

    cfg.UNIFORMER.PRETRAIN_NAME = "uniformer_small_in1k"
    new_params = pretrain.load_pretrained_params(cfg, variables["params"])
    loaded = jax.tree_util.tree_flatten_with_path(new_params)[0]
    orig = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    n_shift = sum(
        1
        for (p1, a), (p2, b) in zip(orig, loaded)
        if np.allclose(np.asarray(b), np.asarray(a) + 0.25, atol=1e-5)
    )
    assert n_shift > len(orig) * 0.8, f"only {n_shift}/{len(orig)} loaded"
    # Unknown names raise with the registry listing.
    with pytest.raises(KeyError):
        pretrain.resolve("not_a_model")


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
