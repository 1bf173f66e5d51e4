"""Round-2 fixes: BGR-consistent eval preprocessing, mixup metric
relabeling, CHECKPOINT_CLEAR_NAME_PATTERN (SSL -> supervised handoff),
FLOPs logging."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.config import get_cfg
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
from pmv_tpu.utils import checkpoint as cu


def _frames(b=2, t=2, s=8):
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.integers(0, 255, (b, t, s, s, 3), dtype=np.uint8)
    )


def test_eval_preprocess_applies_bgr():
    """Train and eval must see the same channel order with USE_BGR_ORDER
    (round-1 bug: eval ran RGB while train ran BGR)."""
    cfg = get_cfg()
    cfg.DATA.USE_BGR_ORDER = True
    frames = _frames()
    train_pre = steps.make_preprocess_fn(cfg, train=False)
    eval_pre = steps.make_eval_preprocess_fn(cfg)
    out_train = train_pre(jax.random.PRNGKey(0), frames)
    out_eval = eval_pre(frames)
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(out_eval))
    # Channel order actually flipped vs the RGB preprocess.
    cfg.DATA.USE_BGR_ORDER = False
    out_rgb = steps.make_eval_preprocess_fn(cfg)(frames)
    np.testing.assert_allclose(
        np.asarray(out_eval), np.asarray(out_rgb)[..., ::-1]
    )


def test_eval_step_uses_bgr(monkeypatch):
    """make_eval_step routes frames through the shared preprocess."""
    cfg = get_cfg()
    cfg.DATA.USE_BGR_ORDER = True
    seen = {}
    orig = steps.make_eval_preprocess_fn

    def spy(c):
        fn = orig(c)
        seen["called"] = True
        return fn

    monkeypatch.setattr(steps, "make_eval_preprocess_fn", spy)
    steps.make_eval_step(cfg, model=None)
    assert seen.get("called")


def _tiny_mvit_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.LOSS_FUNC = "soft_cross_entropy"
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MVIT.DEPTH = 1
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = True
    cfg.MVIT.REL_POS_SPATIAL = False
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1]]
    cfg.MIXUP.ENABLE = True
    cfg.MIXUP.ALPHA = 0.8
    cfg.AUG.ENABLE = False
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    return cfg


def test_mixup_metric_relabel_runs():
    """With mixup the train metrics use the mixed target's top-2 relabel
    (`train_net.py:210-219`); errors stay in [0, 100]."""
    cfg = _tiny_mvit_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    batch = {
        "frames": _frames(b=4, t=2, s=16),
        "labels": jnp.asarray([0, 1, 2, 3]),
    }
    rng = jax.random.PRNGKey(0)
    state, tx = steps.init_state(cfg, model, batch, rng)
    step = jax.jit(steps.make_train_step(cfg, model, tx))
    state, metrics = step(state, batch, rng, 1e-3)
    for k in ("top1_err", "top5_err"):
        v = float(metrics[k])
        assert 0.0 <= v <= 100.0, (k, v)
    assert not bool(metrics["nan"])


def test_clear_name_patterns_unit():
    template = {"enc": {"dense": {"kernel": np.zeros((2, 3), np.float32)}}}
    loaded = {
        "backbone": {
            "enc": {"dense": {"kernel": np.ones((2, 3), np.float32)}}
        },
        "projection": {"kernel": np.ones((3, 4), np.float32)},
    }
    out = cu.clear_name_patterns(loaded, ["backbone/"], template)
    np.testing.assert_allclose(out["enc"]["dense"]["kernel"], 1.0)
    # Dot-style reference patterns accepted too.
    out2 = cu.clear_name_patterns(loaded, ["backbone."], template)
    np.testing.assert_allclose(out2["enc"]["dense"]["kernel"], 1.0)
    # Shape mismatch keeps the template value.
    bad = {"enc": {"dense": {"kernel": np.ones((9, 9), np.float32)}}}
    out3 = cu.clear_name_patterns(bad, [], template)
    np.testing.assert_allclose(out3["enc"]["dense"]["kernel"], 0.0)


def _x3d_dims(cfg):
    cfg.MODEL.ARCH = "x3d"
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.X3D.DIM_C1 = 4
    cfg.X3D.DEPTH_FACTOR = 0.2
    cfg.X3D.DIM_C5 = 16
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.AUG.ENABLE = False


def test_ssl_to_supervised_handoff(tmp_path):
    """Pretrain (contrastive) -> scrub 'backbone/' -> supervised finetune:
    the backbone transfers, the head stays fresh
    (`checkpoint.py:312-328` + `run_*` SSL recipes)."""
    from pmv_tpu.engine import ssl_steps

    # 1. SSL pretrain state (one init is enough — values are random).
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.NUM_CLASSES = 0
    _x3d_dims(cfg)
    cfg.CONTRASTIVE.TYPE = "simclr"
    cfg.CONTRASTIVE.DIM = 8
    cfg.CONTRASTIVE.MLP_DIM = 16
    cfg.CONTRASTIVE.NUM_MLP_LAYERS = 2
    cfg.CONTRASTIVE.QUEUE_LEN = 16
    cfg.CONTRASTIVE.LENGTH = 32
    cfg.CONTRASTIVE.KNN_ON = False
    model = build_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    batch = {
        "frames": _frames(b=2, t=2, s=16),
        "index": jnp.asarray([0, 1]),
    }
    ssl_state, _ = ssl_steps.init_ssl_state(cfg, model, batch, rng)
    assert "backbone" in ssl_state.params
    cfg.OUTPUT_DIR = str(tmp_path)
    cu.save_checkpoint(str(tmp_path), ssl_state, 0, cfg)
    ckpt = cu.get_last_checkpoint(str(tmp_path), cfg.TASK)

    # 2. Supervised finetune init + scrubbed load.
    cfg2 = get_cfg()
    cfg2.MODEL.MODEL_NAME = "X3D"
    cfg2.MODEL.NUM_CLASSES = 5
    _x3d_dims(cfg2)
    cfg2.OUTPUT_DIR = str(tmp_path / "finetune")
    cfg2.TRAIN.CHECKPOINT_FILE_PATH = ckpt
    cfg2.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN = ["backbone/"]
    cfg2.TRAIN.CHECKPOINT_EPOCH_RESET = True
    model2 = build_model(cfg2, dtype=jnp.float32)
    sup_batch = {
        "frames": batch["frames"],
        "labels": jnp.asarray([0, 1]),
    }
    sup_state, _ = steps.init_state(cfg2, model2, sup_batch, rng)
    head_before = jax.tree_util.tree_leaves(sup_state.params)[-1].copy()
    loaded_state, start_epoch = cu.load_train_checkpoint(cfg2, sup_state)
    assert start_epoch == 0

    # Backbone leaves now equal the SSL backbone; the (shape-mismatched or
    # missing) head keeps its fresh values.
    ssl_backbone = cu._flatten_paths(ssl_state.params["backbone"])
    new_flat = cu._flatten_paths(loaded_state.params)
    n_hit = 0
    for k, v in ssl_backbone.items():
        if k in new_flat and np.shape(v) == np.shape(new_flat[k]):
            np.testing.assert_allclose(
                np.asarray(new_flat[k]), np.asarray(v), err_msg=k
            )
            n_hit += 1
    assert n_hit > 5, f"only {n_hit} backbone leaves transferred"


def test_flops_count_tiny_model():
    """eval_flops_per_clip returns a sane per-clip figure and scales out
    batch size (`misc.py:166-226` log_model_info parity)."""
    from pmv_tpu.utils import misc

    cfg = _tiny_mvit_cfg()
    cfg.MIXUP.ENABLE = False
    model = build_model(cfg, dtype=jnp.float32)
    batch1 = {"frames": _frames(b=1, t=2, s=16), "labels": jnp.asarray([0])}
    rng = jax.random.PRNGKey(0)
    state, _ = steps.init_state(cfg, model, batch1, rng)
    f1 = misc.eval_flops_per_clip(state, cfg, model, batch1)
    if f1 < 0:  # backend without cost analysis
        return
    batch2 = {
        "frames": _frames(b=2, t=2, s=16),
        "labels": jnp.asarray([0, 0]),
    }
    f2 = misc.eval_flops_per_clip(state, cfg, model, batch2)
    assert f1 > 1e5
    assert abs(f2 - f1) / f1 < 0.2, (f1, f2)


def test_rbg_prng_and_bf16_preprocess_train_step():
    """TPU-recipe knobs (TPU.PRNG_IMPL=rbg, TPU.PREPROCESS_DTYPE=bfloat16,
    bench.py defaults) run the full aug train step and keep loss finite;
    the rbg typed key threads through fold_in/split in the step."""
    from pmv_tpu.utils import misc

    cfg = _tiny_mvit_cfg()
    cfg.AUG.ENABLE = True
    cfg.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"
    cfg.AUG.RE_PROB = 0.25
    cfg.TPU.PRNG_IMPL = "rbg"
    cfg.TPU.PREPROCESS_DTYPE = "bfloat16"
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    assert jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
    batch = {
        "frames": _frames(b=4, t=2, s=16),
        "labels": jnp.asarray([0, 1, 2, 3]),
    }
    state, tx = steps.init_state(cfg, model, batch, rng)
    train_step = jax.jit(steps.make_train_step(cfg, model, tx))
    state, metrics = train_step(state, batch, rng, 1e-4)
    assert np.isfinite(float(metrics["loss"]))


def test_qkv_split_dots_matches_single_dense():
    """FusedQKVSplitDots == nn.Dense(3*D) then slice (same columns of the
    same kernel; tolerance covers backend reduction reassociation)."""
    import flax.linen as nn

    from pmv_tpu.models.attention import FusedQKVSplitDots

    B, N, C, D, H = 2, 6, 8, 8, 2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, C)),
                    jnp.float32)
    mod = FusedQKVSplitDots(dim_out=D, num_heads=H, use_bias=True,
                            dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    q, k, v = mod.apply(params, x)
    dense = nn.Dense(3 * D, use_bias=True)
    ref = dense.apply({"params": params["params"]}, x)
    ref = ref.reshape(B, N, 3, H, -1)
    # Same math; backends may reassociate the reduction per output width.
    for got, want in ((q, ref[:, :, 0]), (k, ref[:, :, 1]), (v, ref[:, :, 2])):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-7
        )


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
import pytest  # noqa: E402  (slow-mark only)
pytestmark = pytest.mark.slow
