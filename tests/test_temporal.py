import math

import numpy as np

from pmv_tpu.data import temporal


def test_uniform_protocol_no_offset():
    # video 100 frames, clip 64, 5 clips: start = delta * i / 5.
    for i in range(5):
        s, e, frac = temporal.get_start_end_idx(100, 64, i, 5)
        assert s == 36 * i / 5
        assert e == s + 63


def test_offset_protocol():
    s, e, _ = temporal.get_start_end_idx(100, 64, 0, 1, use_offset=True)
    assert s == math.floor(36 / 2)
    # 3 clips with offset: start = i * floor(delta / (n-1)).
    starts = [
        temporal.get_start_end_idx(100, 64, i, 3, use_offset=True)[0]
        for i in range(3)
    ]
    assert starts == [0, 18, 36]


def test_random_sampling_range():
    rng = np.random.default_rng(0)
    for _ in range(20):
        s, e, _ = temporal.get_start_end_idx(100, 64, -1, 1, rng=rng)
        assert 0 <= s <= 36
        assert abs(e - (s + 63)) < 1e-9


def test_short_video_clamps():
    s, e, frac = temporal.get_start_end_idx(10, 64, 0, 5)
    assert s == 0 and e == 63 and frac == 0.0
    idx = temporal.temporal_sampling_indices(10, s, e, 16)
    assert idx.max() == 9 and idx.min() == 0


def test_temporal_sampling_linspace():
    frames = np.arange(32)[:, None]
    out = temporal.temporal_sampling(frames, 0, 31, 16)
    np.testing.assert_array_equal(out[:, 0], np.linspace(0, 31, 16).astype(int))


def test_multiple_start_end_idx_constraints():
    rng = np.random.default_rng(0)
    out = temporal.get_multiple_start_end_idx(
        1000, [64, 64], -1, 1, min_delta=10, max_delta=500, rng=rng
    )
    assert out.shape == (2, 3)
    starts, ends = out[:, 0], out[:, 1]
    gap = np.sort(starts)[1] - np.sort(ends)[0]
    assert 10 <= gap <= 500
