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
