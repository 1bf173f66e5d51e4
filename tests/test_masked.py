import jax
import os
import jax.numpy as jnp
import numpy as np

from pmv_tpu.config import get_cfg
from pmv_tpu.models.masked import MaskMViT, hog_targets, masked_loss
from pmv_tpu.config.cfg_node import freeze_cfg


def _cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 0
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MVIT.DEPTH = 1
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.POOL_KVQ_KERNEL = [1, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1]]
    cfg.AUG.MASK_RATIO = 0.5
    cfg.MASK.PRED_HOG = True  # MaskFeat targets (pixel MAE tested separately)
    return cfg


def test_hog_targets_shapes_and_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    hog = hog_targets(x, nbins=9, cell_sz=8)
    assert hog.shape == (2, 4, 4, 4, 27)
    norms = jnp.linalg.norm(hog, axis=-1)
    assert float(norms.max()) <= 1.0 + 1e-4


def test_hog_orientation_selectivity():
    """A pure vertical gradient puts mass in one orientation bin."""
    ramp = jnp.tile(
        jnp.arange(32, dtype=jnp.float32)[None, None, :, None, None],
        (1, 1, 1, 32, 1),
    )
    x = jnp.tile(ramp, (1, 1, 1, 1, 3))
    hog = hog_targets(x, nbins=9, cell_sz=8)
    per_bin = hog.reshape(-1, 3, 9).sum(axis=(0, 1))
    assert int(jnp.argmax(per_bin)) in (4, 5)  # ~pi/2 orientation


def test_maskmvit_forward_and_loss():
    cfg = _cfg()
    model = MaskMViT(cfg=freeze_cfg(cfg), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, train=False,
    )
    pred, target, mask = model.apply(
        variables, x, train=False, rngs={"mask": jax.random.PRNGKey(2)}
    )
    n_tok = 2 * 8 * 8
    assert pred.shape == (2, n_tok, 27)
    assert target.shape == (2, n_tok, 27)
    assert mask.shape == (2, n_tok)
    # ~50% masked.
    frac = float(mask.mean())
    assert 0.3 < frac < 0.7
    loss = masked_loss(pred, target, mask)
    assert float(loss) > 0


def test_maskmvit_trains():
    import optax

    cfg = _cfg()
    model = MaskMViT(cfg=freeze_cfg(cfg), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, train=False,
    )
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            pred, target, mask = model.apply(
                {"params": p}, x, train=True,
                rngs={"mask": key, "dropout": key},
            )
            return masked_loss(pred, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for i in range(4):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(5))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_maskmvit_pixel_targets_and_decoder():
    """MAE-style pixel targets (TIME_STRIDE_LOSS + NORM_PRED_PIXEL) and the
    DECODER_DEPTH decoder stack (`masked.py:78-120,219-243`)."""
    cfg = _cfg()
    cfg.MASK.PRED_HOG = False
    cfg.MASK.DECODER_DEPTH = 1
    cfg.MASK.DECODER_EMBED_DIM = 16
    model = MaskMViT(cfg=freeze_cfg(cfg), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, train=False,
    )
    pred, target, mask = model.apply(
        variables, x, train=False, rngs={"mask": jax.random.PRNGKey(2)}
    )
    n_tok = 2 * 8 * 8
    # One frame per temporal patch (stride 2), 4x4 spatial patch, 3 ch.
    assert pred.shape == (2, n_tok, 48)
    assert target.shape == (2, n_tok, 48)
    # Per-patch normalization: ~zero mean, ~unit variance.
    assert abs(float(target.mean())) < 1e-4
    assert abs(float(target.var(axis=-1).mean()) - 1.0) < 0.1
    assert "decoder_blocks.0" in variables["params"]
    loss = masked_loss(pred, target, mask)
    assert float(loss) > 0


def test_masking_generators():
    """Blockwise generators hit the requested density on the window
    (`transform.py:984-1160`)."""
    import numpy as np

    from pmv_tpu.data.masking import (
        MaskingGenerator, MaskingGenerator3D, gen_mask,
    )

    rng = np.random.default_rng(0)
    gen2 = MaskingGenerator((14, 14), 60, min_num_patches=12, rng=rng)
    m2 = gen2()
    assert m2.shape == (14, 14)
    assert 40 <= m2.sum() <= 80

    gen3 = MaskingGenerator3D((8, 7, 7), 157, min_num_patches=9,
                              max_num_patches=49, rng=rng)
    m3 = gen3()
    assert m3.shape == (8, 7, 7)
    assert 100 <= m3.sum() <= 180

    from pmv_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.AUG.MASK_WINDOW_SIZE = [8, 7, 7]
    cfg.AUG.MASK_RATIO = 0.4
    m = gen_mask(cfg, rng)
    assert m.shape == (8, 7, 7)
    cfg.AUG.MASK_FRAMES = True
    mf = gen_mask(cfg, rng)
    assert set(np.unique(mf.sum(axis=(1, 2)))) <= {0, 49}
    cfg.AUG.MASK_FRAMES = False
    cfg.AUG.MASK_TUBE = True
    mt = gen_mask(cfg, rng)
    assert (mt == mt[0]).all()  # tubed over time


def test_masked_step_with_loader_mask():
    """GEN_MASK_LOADER path: batch['mask'] drives the masked step."""
    import jax
    import numpy as np

    from pmv_tpu.config import get_cfg
    from pmv_tpu.engine import ssl_steps
    from pmv_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.MVIT.DEPTH = 1
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = False
    cfg.MASK.ENABLE = True
    cfg.MASK.PRED_HOG = False
    cfg.AUG.GEN_MASK_LOADER = True
    cfg.AUG.MASK_WINDOW_SIZE = [2, 4, 4]
    cfg.AUG.MASK_RATIO = 0.4

    model = build_model(cfg, dtype=None)
    rng_np = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(
            rng_np.integers(0, 255, (2, 4, 16, 16, 3), dtype=np.uint8)
        ),
        "labels": jnp.asarray([0, 1]),
        "mask": jnp.asarray(
            rng_np.uniform(size=(2, 32)) < 0.4
        ),
    }
    rng = jax.random.PRNGKey(0)
    state, tx = ssl_steps.init_masked_state(cfg, model, batch, rng)
    step = jax.jit(ssl_steps.make_masked_train_step(cfg, model, tx))
    new_state, metrics = step(state, batch, rng, 1e-4)
    assert np.isfinite(float(metrics["loss"]))


def test_patchify_roundtrip_and_mae_visualize():
    """unpatchify(patchify(x)) == x; VIS_MASK comparison stack geometry."""
    from pmv_tpu.data.masking import gen_mask  # noqa: F401 (import check)
    from pmv_tpu.models.masked import (
        mae_visualize, patchify_pixels, unpatchify_pixels,
    )

    cfg = _cfg()
    cfg.MASK.PRED_HOG = False
    cfg.MASK.TIME_STRIDE_LOSS = True
    cfg.MASK.NORM_PRED_PIXEL = False
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 4, 32, 32, 3))
        .astype(np.float32)
    )
    patches, geom = patchify_pixels(cfg, x)
    back = unpatchify_pixels(patches, geom)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x[:, ::2]))

    n_tok = patches.shape[1]
    pred = jnp.zeros_like(patches)
    mask = jnp.asarray(np.random.default_rng(1).uniform(size=(2, n_tok)) < 0.5)
    comp = np.asarray(mae_visualize(cfg, x, pred, mask))
    assert comp.shape == (2, 3, 2, 32, 32, 3)
    # Original plane is exact; reconstruction has zeros at masked patches.
    np.testing.assert_allclose(comp[:, 0], np.asarray(x[:, ::2]).astype(np.uint8))


def test_vis_mask_test_entry(tmp_path):
    """test() VIS_MASK path end-to-end on synthetic data."""
    from pmv_tpu.engine.test import test as test_entry

    cfg = _cfg()
    cfg.MASK.PRED_HOG = False
    cfg.VIS_MASK.ENABLE = True
    cfg.TEST.DATASET = "synthetic"
    cfg.TEST.BATCH_SIZE = 2
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 4
    cfg.OUTPUT_DIR = str(tmp_path)
    out = test_entry(cfg)
    assert out and all(os.path.exists(p) for p in out)
    comp = np.load(out[0])
    assert comp.ndim == 6 and comp.shape[1] == 3


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
import pytest  # noqa: E402  (slow-mark only)
pytestmark = pytest.mark.slow
