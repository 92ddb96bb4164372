"""Pure decode math: fps-grid frame resampling and audio trim/pad — the
testable core of the PyAV/ffmpeg backends (reference semantics:
utils/ioutils/av_wrappers.py:31-53 video grid, :99-111 audio window),
verified without codecs (this host ships none)."""

import numpy as np

from avid_cma_tpu.data.decode import fps_grid_indices, trim_pad_audio


def test_fps_grid_downsample_picks_latest_at_or_before():
    # source 30 fps, target 10 fps: every 3rd frame
    times = np.arange(30) / 30.0
    idx = fps_grid_indices(times, start=0.0, n_target=10, fps=10.0)
    np.testing.assert_array_equal(idx, np.arange(10) * 3)


def test_fps_grid_upsample_duplicates_frames():
    # source 8 fps, target 16 fps: each source frame used twice
    times = np.arange(8) / 8.0
    idx = fps_grid_indices(times, start=0.0, n_target=16, fps=16.0)
    np.testing.assert_array_equal(idx, np.repeat(np.arange(8), 2))


def test_fps_grid_nonzero_start_and_clamping():
    times = 1.0 + np.arange(16) / 16.0  # decode began at t=1.0
    idx = fps_grid_indices(times, start=1.0, n_target=20, fps=16.0)
    assert idx[0] == 0
    assert idx[-1] == 15  # grid points past the last frame clamp to it
    assert (np.diff(idx) >= 0).all()


def test_fps_grid_handles_jittered_timestamps():
    # real streams have non-uniform pts; grid must stay monotone and
    # pick the latest frame at-or-before each grid point
    rng = np.random.default_rng(0)
    times = np.sort(rng.uniform(0, 1, size=24))
    idx = fps_grid_indices(times, start=0.0, n_target=16, fps=16.0)
    want = np.asarray(0.0) + np.arange(16) / 16.0
    assert (np.diff(idx) >= 0).all()
    for k, i in enumerate(idx):
        # latest frame at-or-before the grid point; index 0 is exempt
        # ONLY when the stream starts after the grid point (clamping)
        assert times[i] <= want[k] or (i == 0 and times[0] > want[k])
        if i + 1 < len(times):
            assert times[i + 1] > want[k]


def test_trim_pad_audio_trims_seek_leadin():
    sr = 100
    # decode began 0.5 s before the requested start
    sig = np.arange(200, dtype=np.float32)
    out = trim_pad_audio(sig, decode_start=1.0, start=1.5, sample_rate=sr,
                         n_target=100)
    np.testing.assert_array_equal(out, np.arange(50, 150))


def test_trim_pad_audio_pads_short_streams():
    sr = 100
    sig = np.ones(30, np.float32)
    out = trim_pad_audio(sig, decode_start=0.0, start=0.0, sample_rate=sr,
                         n_target=50)
    assert out.shape == (50,)
    np.testing.assert_array_equal(out[:30], 1.0)
    np.testing.assert_array_equal(out[30:], 0.0)


def test_trim_pad_audio_exact_window():
    out = trim_pad_audio(np.arange(80, dtype=np.float32), 0.0, 0.0, 100, 80)
    assert out.shape == (80,)
    np.testing.assert_array_equal(out, np.arange(80))
