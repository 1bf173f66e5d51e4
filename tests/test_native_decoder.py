"""Round-trip test of the native FFmpeg decode library."""

import numpy as np
import pytest

from pmv_tpu.native import binding


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    """Synthesize a 64-frame video where frame i is solid gray level 3*i."""
    path = tmp_path_factory.mktemp("vids") / "test.avi"
    t, h, w = 64, 48, 64
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        frames[i] = i * 3
    binding.write_test_video(path, frames, fps=30)
    return str(path), frames


def test_open_and_info(test_video):
    path, frames = test_video
    with binding.VideoReader(path) as vr:
        assert vr.width == 64
        assert vr.height == 48
        assert abs(vr.fps - 30) < 0.1
        assert vr.num_frames == 64


def test_decode_exact_frames(test_video):
    path, frames = test_video
    with binding.VideoReader(path) as vr:
        idx = [0, 7, 31, 63]
        out = vr.read_frames(idx)
        assert out.shape == (4, 48, 64, 3)
        for j, i in enumerate(idx):
            expected = i * 3
            got = int(np.median(out[j]))
            assert abs(got - expected) <= 2, f"frame {i}: {got} != {expected}"


def test_decode_with_resize(test_video):
    path, _ = test_video
    with binding.VideoReader(path) as vr:
        out = vr.read_frames([10, 20], out_w=32, out_h=24)
        assert out.shape == (2, 24, 32, 3)
        assert abs(int(np.median(out[0])) - 30) <= 2


def test_decode_seek_mid_video(test_video):
    """PTS-selective path: ask only for late frames; content must match."""
    path, _ = test_video
    with binding.VideoReader(path) as vr:
        out = vr.read_frames([50, 55, 60])
        meds = [int(np.median(out[i])) for i in range(3)]
        assert [abs(m - e) <= 2 for m, e in zip(meds, [150, 165, 180])]


def test_repeated_indices(test_video):
    path, _ = test_video
    with binding.VideoReader(path) as vr:
        out = vr.read_frames([5, 5, 5, 9])
        assert out.shape[0] == 4
        np.testing.assert_array_equal(out[0], out[1])


@pytest.fixture(scope="module")
def h264_video(tmp_path_factory):
    """H.264 mp4 with real GOP structure (keyframes every 15, B-frames):
    frame i carries a solid gray ramp so index identity is checkable
    despite lossy encode."""
    path = tmp_path_factory.mktemp("vids") / "test.mp4"
    t, h, w = 64, 96, 64
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        frames[i] = i * 3
    binding.write_video_h264(path, frames, fps=30, gop=15, crf=20)
    return str(path), frames


def test_h264_roundtrip_and_meta(h264_video):
    path, frames = h264_video
    with binding.VideoReader(path) as vr:
        assert vr.width == 64 and vr.height == 96
        assert vr.num_frames == 64
        # mp4 avg rate excludes the last frame's span (pyav average_rate
        # reports the same) — the sampling math tolerates the ~1.6% skew.
        assert abs(vr.fps - 30) < 0.6
        out = vr.read_frames([0, 7, 31, 63])
        for k, i in enumerate([0, 7, 31, 63]):
            med = int(np.median(out[k]))
            assert abs(med - i * 3) <= 3, (i, med)


def test_h264_seek_lands_on_exact_frame(h264_video):
    """Selective seek into GOP interiors (B-frame reorder territory):
    frame identity must be exact, incl. the last frame whose pts*avg_rate
    rounds to the wrong index if mapped with the mp4 avg rate."""
    path, _ = h264_video
    with binding.VideoReader(path) as vr:
        full = vr.read_frames(list(range(64)))
    with binding.VideoReader(path) as vr:
        for idx in ([17], [33, 34], [62, 63], [1, 16, 47]):
            out = vr.read_frames(idx)
            for k, i in enumerate(idx):
                np.testing.assert_array_equal(out[k], full[i], err_msg=str(i))


def test_h264_no_overflow_on_odd_resize(h264_video):
    """swscale SIMD row tails must not write past the packed output
    (regression: 24-byte heap overflow on yuv420p->rgb24 before the
    staging-buffer fix)."""
    path, _ = h264_video
    with binding.VideoReader(path) as vr:
        lib = binding.get_lib()
        import ctypes

        for ow, oh in ((37, 54), (61, 90)):
            fb = ow * oh * 3
            buf = np.full(fb + 4096, 0xAB, np.uint8)
            idx = np.array([5], np.int64)
            got = lib.pmv_decode_frames(
                vr._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                1,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                ow, oh,
            )
            assert got == 1
            assert (buf[fb:] == 0xAB).all(), (ow, oh)


def test_resize_bilinear_torch_parity():
    """The native exact-protocol resize (AVX2 rows when available) matches
    torch F.interpolate(bilinear, align_corners=False) within uint8
    rounding on every shape class (up/down/mixed/identity).

    The AVX2 row kernels are written to be bit-identical to the scalar
    reference (same a+(b-a)*f order, no FMA, round-to-nearest-even);
    PMV_NO_AVX2=1 forces the scalar path for A/B debugging."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for sh, sw, dh, dw in [
        (640, 360, 320, 182),   # portrait downscale (PMV protocol)
        (360, 640, 182, 320),   # landscape downscale
        (100, 77, 300, 200),    # upscale
        (719, 1283, 182, 320),  # odd dims, heavy downscale
        (33, 47, 33, 47),       # identity
    ]:
        img = rng.integers(0, 256, (sh, sw, 3), np.uint8)
        out = binding.resize_bilinear(img, dh, dw)
        t = torch.from_numpy(img).permute(2, 0, 1)[None].float()
        ref = F.interpolate(t, size=(dh, dw), mode="bilinear",
                            align_corners=False)
        ref = ref.clamp(0, 255).round().byte()[0].permute(1, 2, 0).numpy()
        diff = np.abs(out.astype(int) - ref.astype(int)).max()
        assert diff <= 1, (sh, sw, dh, dw, diff)
