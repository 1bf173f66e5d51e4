import numpy as np
import pytest

from pmv_tpu.data import spatial, transform

torch = pytest.importorskip("torch")


def test_resize_matches_torch_bilinear():
    """Our host resize must bit-match torch F.interpolate(align_corners=False)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(2, 31, 47, 3)).astype(np.float32)
    out = transform.resize_bilinear(img, 17, 23)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            size=(17, 23),
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-4)


def test_short_side_scale():
    img = np.zeros((1, 90, 160, 3), np.float32)
    out = transform.short_side_scale(img, 45)
    assert out.shape == (1, 45, 80, 3)
    # Portrait.
    img = np.zeros((1, 160, 90, 3), np.float32)
    out = transform.short_side_scale(img, 45)
    assert out.shape == (1, 80, 45, 3)


def test_uniform_crop_rect_positions():
    # Portrait frame 320x180, rect crop [256, 144].
    img = np.arange(320 * 180, dtype=np.float32).reshape(1, 320, 180, 1)
    top = transform.uniform_crop_rect(img, [256, 144], 0)
    mid = transform.uniform_crop_rect(img, [256, 144], 1)
    bot = transform.uniform_crop_rect(img, [256, 144], 2)
    assert top.shape == mid.shape == bot.shape == (1, 256, 144, 1)
    assert top[0, 0, 0, 0] == img[0, 0, 18, 0]  # x centered: ceil((180-144)/2)=18
    assert bot[0, -1, 0, 0] == img[0, 319, 18, 0]
    assert mid[0, 0, 0, 0] == img[0, 32, 18, 0]  # ceil((320-256)/2)=32


def test_scale_adjust_rect():
    # Portrait crop [256, 192] on a landscape frame 1080x1920 must raise
    # min_scale to the crop height.
    mn, mx = spatial.scale_adjust_short_side_scale_jitter(224, 320, [256, 192], 1080, 1920)
    assert mn == 256 and mx == 320
    # Portrait frame 1920x1080 with portrait crop: min set by w/h ratio.
    mn, _ = spatial.scale_adjust_short_side_scale_jitter(
        128, 320, [256, 192], 1920, 1080
    )
    assert mn == int(np.ceil(1080 / 1920 * 256))


def test_spatial_sampling_train_rect():
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (4, 320, 180, 3)).astype(np.float32)
    out = spatial.spatial_sampling(
        frames,
        spatial_idx=-1,
        min_scale=200,
        max_scale=250,
        rect_crop_size=[256, 192],
        auto_adjust=True,
        rng=rng,
    )
    assert out.shape == (4, 256, 192, 3)


def test_spatial_sampling_test_protocol():
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (2, 640, 360, 3)).astype(np.float32)
    for idx in (0, 1, 2):
        out = spatial.spatial_sampling(
            frames,
            spatial_idx=idx,
            min_scale=256,
            max_scale=256,
            crop_size=224,
            rng=rng,
        )
        assert out.shape == (2, 224, 224, 3)


def test_spatial_sampling_dense_crop():
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (2, 640, 360, 3)).astype(np.float32)
    out = spatial.spatial_sampling(
        frames,
        spatial_idx=-2,
        min_scale=256,
        max_scale=256,
        crop_size=224,
        rel_center_ratio=[0.25, 0.75],
        rng=rng,
    )
    assert out.shape == (2, 224, 224, 3)


def test_random_resized_crop_shape():
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (4, 320, 180, 3)).astype(np.float32)
    out = transform.random_resized_crop(
        frames, 256, 192, scale=(0.08, 1.0), ratio=(0.75, 1.3333), rng=rng
    )
    assert out.shape == (4, 256, 192, 3)


def test_tensor_normalize():
    img = np.full((1, 4, 4, 3), 255.0, np.float32)
    out = transform.tensor_normalize(img, [0.45, 0.45, 0.45], [0.225, 0.225, 0.225])
    np.testing.assert_allclose(out, (1.0 - 0.45) / 0.225, rtol=1e-5)
