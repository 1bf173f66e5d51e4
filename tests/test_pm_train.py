"""Portrait (`pm`) dual-specialization training end-to-end.

Exercises the SWITCH_AUTO path: mixed portrait/landscape videos -> rect
crops with per-sample pm flags -> the pm-aware train step that runs both
orientation specializations over shared params and selects per sample.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.data.build import build_dataset
from pmv_tpu.data.loader import DataLoader
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
import pmv_tpu.data  # noqa: F401


@pytest.fixture
def pm_cfg(tmp_path):
    from pmv_tpu.native import binding

    vids = tmp_path / "videos"
    vids.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    # Portrait and landscape sources mixed.
    for i, (h, w) in enumerate([(96, 56), (56, 96), (96, 56), (56, 96)]):
        frames = rng.integers(0, 255, (24, h, w, 3), dtype=np.uint8)
        binding.write_test_video(vids / f"v{i}.avi", frames, fps=12)
        rows.append(f"v{i}.avi,{i % 2}")
    (tmp_path / "train_pmv.csv").write_text("\n".join(rows) + "\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(vids)
    cfg.DATA.PM_SUBSET = "_pmv"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [48, 56]
    cfg.DATA.TRAIN_CROP_SIZE_RECT = [32, 16]
    cfg.DATA.TRAIN_CROP_SIZE_RECT_SWITCH_AUTO = True
    cfg.DATA.TRAIN_JITTER_SCALES_AUTO_ADJUST = True
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MVIT.DEPTH = 1
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1]]
    cfg.MIXUP.ENABLE = False
    cfg.AUG.ENABLE = False
    return cfg


def test_pm_mixed_batch_trains(pm_cfg):
    cfg = pm_cfg
    ds = build_dataset("kinetics", cfg, "train")
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    # Mixed orientation batch with homogeneous tensor shape.
    assert batch["frames"].shape == (4, 2, 32, 16, 3)
    assert batch["pm"].any() and not batch["pm"].all()

    model = build_model(cfg, dtype=jnp.float32)
    model_port = build_model(cfg, hw_switch=True, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    state, tx = steps.init_state(
        cfg, model, {"frames": batch["frames"], "labels": batch["labels"]}, rng
    )
    step = jax.jit(steps.make_train_step(cfg, model, tx, model_pm=model_port))
    device_batch = {
        "frames": jnp.asarray(batch["frames"]),
        "labels": jnp.asarray(batch["labels"]),
        "pm": jnp.asarray(batch["pm"]),
    }
    state, metrics = step(state, device_batch, rng, 1e-3)
    assert not bool(metrics["nan"])
    assert int(state.step) == 1


def test_pm_eval_selects_per_sample(pm_cfg):
    """The pm eval step must differ from the landscape-only step exactly on
    the portrait rows."""
    from pmv_tpu.engine.train import _make_pm_eval_step

    cfg = pm_cfg
    ds = build_dataset("kinetics", cfg, "train")
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    model = build_model(cfg, dtype=jnp.float32)
    model_port = build_model(cfg, hw_switch=True, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    state, _ = steps.init_state(
        cfg, model, {"frames": batch["frames"], "labels": batch["labels"]}, rng
    )
    eval_step = jax.jit(steps.make_eval_step(cfg, model))
    eval_pm = jax.jit(_make_pm_eval_step(cfg, model, model_port))
    frames = jnp.asarray(batch["frames"])
    pm = jnp.asarray(batch["pm"])
    p_plain = np.asarray(eval_step(state, frames))
    p_pm = np.asarray(eval_pm(state, frames, pm))
    pm_np = np.asarray(batch["pm"])
    # Landscape rows identical; portrait rows generally differ.
    np.testing.assert_allclose(
        p_plain[~pm_np], p_pm[~pm_np], atol=1e-5
    )
    assert np.abs(p_plain[pm_np] - p_pm[pm_np]).max() > 1e-6


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
