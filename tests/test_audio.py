"""Audio decode, log-mel features, and AVSlowFast tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.config import get_cfg
from pmv_tpu.data import audio as audio_lib
from pmv_tpu.models import build_model
from pmv_tpu.native import binding


def test_audio_roundtrip(tmp_path):
    """Write a 440 Hz tone, decode it back, verify the spectrum peak."""
    sr = 16000
    t = np.arange(sr * 2) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    frames = np.zeros((20, 32, 32, 3), np.uint8)
    path = tmp_path / "av.avi"
    binding.write_test_video(path, frames, fps=10, audio=tone, audio_sr=sr)
    with binding.VideoReader(path) as vr:
        wav = vr.read_audio(0.0, 1.0, sample_rate=sr)
    assert len(wav) >= sr // 2
    spec = np.abs(np.fft.rfft(wav[: sr // 2]))
    freq = np.fft.rfftfreq(sr // 2, 1 / sr)
    peak = freq[np.argmax(spec)]
    assert abs(peak - 440) < 10, f"peak at {peak} Hz"


def test_audio_resample(tmp_path):
    """Decode at a different rate than stored: length scales accordingly."""
    sr = 16000
    tone = np.random.default_rng(0).normal(0, 0.1, sr).astype(np.float32)
    frames = np.zeros((10, 16, 16, 3), np.uint8)
    path = tmp_path / "av.avi"
    binding.write_test_video(path, frames, fps=10, audio=tone, audio_sr=sr)
    with binding.VideoReader(path) as vr:
        wav8k = vr.read_audio(0.0, 1.0, sample_rate=8000)
    assert abs(len(wav8k) - 8000) < 800


def test_no_audio_stream(tmp_path):
    frames = np.zeros((5, 16, 16, 3), np.uint8)
    path = tmp_path / "v.avi"
    binding.write_test_video(path, frames, fps=5)
    with binding.VideoReader(path) as vr:
        wav = vr.read_audio(0.0, 1.0)
    assert len(wav) == 0


def test_logmel_shapes_and_tone():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    lm = audio_lib.gen_logmel(tone, sr=sr, num_frames=128)
    assert lm.shape == (128, 40)
    # Energy concentrates in one mel band.
    band_energy = lm[:60].mean(axis=0)
    assert band_energy.argmax() > 5  # 1 kHz is well above the lowest band


def test_mel_filterbank_partition():
    fb = audio_lib.mel_filterbank(16000, 512, 40)
    assert fb.shape == (40, 257)
    assert fb.min() >= 0
    # Interior frequencies are covered by at least one filter.
    coverage = fb.sum(axis=0)[5:-5]
    assert (coverage > 0).all()


def test_avslowfast_forward():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AVSlowFast"
    cfg.MODEL.ARCH = "avslowfast"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    model = build_model(cfg, dtype=jnp.float32)
    slow = jnp.zeros((1, 2, 32, 32, 3))
    fast = jnp.zeros((1, 8, 32, 32, 3))
    audio = jnp.zeros((1, 128, 40))
    variables = model.init(
        jax.random.PRNGKey(0), [slow, fast, audio], train=False
    )
    out = model.apply(variables, [slow, fast, audio], train=False)
    assert out.shape == (1, 5)
    v_emb, a_emb = model.apply(
        variables, [slow, fast, audio], train=False, return_embeddings=True
    )
    assert v_emb.ndim == 2 and a_emb.ndim == 2


def test_avs_loss():
    from pmv_tpu.models.avslowfast import avs_loss

    rng = jax.random.PRNGKey(0)
    v = jax.random.normal(rng, (4, 16))
    # Aligned = same direction, misaligned = random.
    loss_good = avs_loss(v, v, jax.random.normal(jax.random.PRNGKey(1), (4, 16)))
    loss_bad = avs_loss(v, jax.random.normal(jax.random.PRNGKey(2), (4, 16)), v)
    assert float(loss_good) < float(loss_bad)


def test_avslowfast_avs_misaligned_train():
    """Misaligned audio -> per-junction AVS losses + DropPathway gating
    (`video_model_builder.py:879-996`)."""
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AVSlowFast"
    cfg.MODEL.ARCH = "avslowfast"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.DATA.GET_MISALIGNED_AUDIO = True
    cfg.SLOWFAST.AVS_FLAG = [False, False, True, True, True]
    cfg.SLOWFAST.AFS_FUSION = [False, False, False, True]
    model = build_model(cfg, dtype=jnp.float32)
    slow = jnp.zeros((2, 2, 32, 32, 3))
    fast = jnp.zeros((2, 8, 32, 32, 3))
    audio = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 40))
    audio_mis = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 40))
    inputs = [slow, fast, audio, audio_mis]
    variables = model.init(
        jax.random.PRNGKey(0), inputs, train=True,
    )
    out, aux = model.apply(
        variables, inputs, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    assert out.shape == (2, 5)
    # AVS at junctions s3 (idx 2), s4 (idx 3) and s5 (idx 4).
    assert set(aux) == {"s3_avs", "s4_avs", "s5_avs"}
    for v in aux.values():
        assert jnp.isfinite(v)
    # Eval path (no misaligned audio): plain logits.
    out_eval = model.apply(variables, [slow, fast, audio], train=False)
    assert out_eval.shape == (2, 5)


def test_avslowfast_fs_fusion_flags():
    """FS_FUSION gates the fast->slow concat per stage."""
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AVSlowFast"
    cfg.MODEL.ARCH = "avslowfast"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FS_FUSION = [True, False, True, False]
    cfg.SLOWFAST.AFS_FUSION = [False, True, False, False]
    model = build_model(cfg, dtype=jnp.float32)
    slow = jnp.zeros((1, 2, 32, 32, 3))
    fast = jnp.zeros((1, 8, 32, 32, 3))
    audio = jnp.zeros((1, 128, 40))
    variables = model.init(
        jax.random.PRNGKey(0), [slow, fast, audio], train=False
    )
    out = model.apply(variables, [slow, fast, audio], train=False)
    assert out.shape == (1, 3)


def test_easy_negative_audio_mixing_semantics():
    """AVS easy negatives (`loader.py:25-43`): all rows roll before
    MIX_NEG_EPOCH, only the EASY_NEG_RATIO prefix afterwards."""
    import numpy as np

    def mix(audio_mis, epoch, ratio, mix_epoch):
        n = audio_mis.shape[0]
        sn = max(int(ratio * n), 1) if epoch >= mix_epoch else n
        idx = np.arange(n)
        idx[:sn] = np.arange(1, sn + 1) % sn
        return audio_mis[idx]

    a = np.arange(8)[:, None]  # 8 samples, identifiable
    early = mix(a, epoch=0, ratio=0.75, mix_epoch=96)
    # All rows shifted by one (circular): easy negatives from other videos.
    np.testing.assert_array_equal(early.ravel(), np.roll(np.arange(8), -1))
    late = mix(a, epoch=100, ratio=0.75, mix_epoch=96)
    # Only the first 6 rows rolled; the last 2 keep their own (hard) rows.
    np.testing.assert_array_equal(late.ravel()[-2:], [6, 7])
    assert (late.ravel()[:6] == np.arange(1, 7) % 6).all()


def test_preprocess_bgr_order():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmv_tpu.config import get_cfg
    from pmv_tpu.engine.steps import make_preprocess_fn

    cfg = get_cfg()
    cfg.DATA.USE_BGR_ORDER = True
    cfg.DATA.MEAN = [0.0, 0.0, 0.0]
    cfg.DATA.STD = [1.0 / 255, 1.0 / 255, 1.0 / 255]
    pre = make_preprocess_fn(cfg, train=True)
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 2, 4, 4, 3), np.uint8)
    )
    out = np.asarray(pre(jax.random.PRNGKey(0), frames))
    np.testing.assert_allclose(out, np.asarray(frames)[..., ::-1].astype(np.float32))


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow


def test_avslowfast_engine_init_with_misaligned_audio():
    """init_state must create the AVS params when the batch carries
    audio_mis (GET_MISALIGNED_AUDIO recipes train through the engine);
    round-5 regression — the engine previously dropped audio_mis at init
    and the train step crashed on the missing avs/ref_fc params."""
    import numpy as np

    from pmv_tpu.engine import steps
    from pmv_tpu.parallel import mesh as mesh_lib

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AVSlowFast"
    cfg.MODEL.ARCH = "avslowfast"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.USE_AUDIO = True
    cfg.DATA.GET_MISALIGNED_AUDIO = True
    cfg.DATA.AUDIO_FRAME_NUM = 64
    cfg.DATA.AUDIO_MEL_NUM = 16
    from pmv_tpu.models import build_model

    model = build_model(cfg, dtype=jnp.float32)
    rng_np = np.random.default_rng(0)
    bs = jax.device_count()  # data-sharded batch must divide the mesh
    batch = {
        "frames": jnp.asarray(rng_np.integers(
            0, 255, (bs, 8, 32, 32, 3), dtype=np.uint8)),
        "labels": jnp.asarray(rng_np.integers(0, 5, (bs,))),
        "audio": jnp.asarray(
            rng_np.standard_normal((bs, 64, 16)), jnp.float32),
        "audio_mis": jnp.asarray(
            rng_np.standard_normal((bs, 64, 16)), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    state, tx = steps.init_state(cfg, model, batch, rng)
    mesh = mesh_lib.create_mesh()
    state = mesh_lib.replicate(state, mesh)
    db = mesh_lib.shard_batch(batch, mesh)
    step = jax.jit(steps.make_train_step(cfg, model, tx))
    state2, metrics = step(state, db, rng, 1e-4)
    assert np.isfinite(float(metrics["loss"]))
