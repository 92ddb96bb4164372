"""EXECUTED-path coverage for the real-media decode backends
(data/decode.py PyAVBackend / FFmpegCLIBackend — reference semantics:
utils/ioutils/av_wrappers.py:17-113).

This image ships neither libav nor an ffmpeg binary, so the codecs are
faked at their exact interface boundaries — a stand-in `av` module with
keyframe-snapping seek, and stand-in `ffmpeg`/`ffprobe` executables on
PATH emitting deterministic raw bytes/JSON — while every line of the
backends' own logic (seek-unit conversion, keyframe lead-in skipping,
fps-grid duplication, resampler chunk handling, audio trim/pad,
stdout/raw-byte parsing, the metadata LRU) runs for real. Content is a
pure function of absolute time, so expected outputs are computed
independently, not replayed.

When a real ffmpeg/PyAV is present the same fixtures could be generated
as actual media; these tests deliberately do not require that.
"""

import fractions
import os
import stat
import sys
import textwrap

import numpy as np
import pytest

from avid_cma_tpu.data.decode import (
    FFmpegCLIBackend,
    PyAVBackend,
    VideoMeta,
)

# deterministic "file" content: pure functions of absolute position
SRC_FPS = 8.0
SRC_DUR = 4.0
SRC_W, SRC_H = 32, 24
SRC_RATE = 8000


def frame_at(k: int) -> np.ndarray:
    """uint8 (H, W, 3) for source frame k (t = k / SRC_FPS)."""
    f = np.empty((SRC_H, SRC_W, 3), np.uint8)
    for c in range(3):
        f[:, :, c] = (k * (7 + 6 * c)) % 251
    return f


def audio_sample(i):
    """int16 value of absolute source sample i."""
    return ((np.asarray(i) * 37) % 20001 - 10000).astype(np.int16)


# ---------------------------------------------------------------------------
# fake PyAV: keyframes every 1.0 s video / 0.5 s audio, 1/1000 time base
# ---------------------------------------------------------------------------

TIME_BASE = fractions.Fraction(1, 1000)
VIDEO_KEYFRAME_S = 1.0
AUDIO_BLOCK_S = 0.5  # audio packets decode in half-second blocks


class _VideoFrame:
    def __init__(self, k):
        self.pts = int(k / SRC_FPS * 1000)
        self._k = k

    def to_ndarray(self, format=None):
        assert format == "rgb24"
        return frame_at(self._k)


class _AudioFrame:
    def __init__(self, block):
        n = int(AUDIO_BLOCK_S * SRC_RATE)
        self.pts = int(block * AUDIO_BLOCK_S * 1000)
        self._lo = block * n
        self._n = n

    def to_ndarray(self):
        return audio_sample(np.arange(self._lo, self._lo + self._n)).reshape(1, -1)


class _VideoStream:
    time_base = TIME_BASE
    duration = int(SRC_DUR * 1000)
    average_rate = fractions.Fraction(int(SRC_FPS), 1)
    width, height = SRC_W, SRC_H


class _AudioStream:
    time_base = TIME_BASE
    rate = SRC_RATE


class _Streams:
    def __init__(self):
        self.video = [_VideoStream()]
        self.audio = [_AudioStream()]


class _Container:
    def __init__(self, path):
        self.streams = _Streams()
        self._seek_t = 0.0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def seek(self, offset, stream=None):
        # real demuxers land on the nearest KEYFRAME at-or-before the
        # requested pts — that lead-in is exactly what the backend's
        # skip/trim logic must remove
        t = float(offset * stream.time_base)
        snap = VIDEO_KEYFRAME_S if isinstance(stream, _VideoStream) else AUDIO_BLOCK_S
        self._seek_t = max(0.0, (t // snap) * snap)

    def decode(self, video=None, audio=None):
        if video is not None:
            k0 = int(round(self._seek_t * SRC_FPS))
            for k in range(k0, int(SRC_DUR * SRC_FPS)):
                yield _VideoFrame(k)
        else:
            b0 = int(round(self._seek_t / AUDIO_BLOCK_S))
            for b in range(b0, int(SRC_DUR / AUDIO_BLOCK_S)):
                yield _AudioFrame(b)


class _Resampler:
    """Identity resampler (target == source rate): chunk pass-through,
    including PyAV's list-or-frame return ambiguity."""

    def __init__(self, format, layout, rate):
        assert (format, layout) == ("s16", "mono")
        assert rate == SRC_RATE, "fake resampler is identity-rate only"
        self._flip = False

    def resample(self, frame):
        self._flip = not self._flip  # alternate both return styles
        return [frame] if self._flip else frame


class _FakeAV:
    AudioResampler = _Resampler

    @staticmethod
    def open(path):
        return _Container(path)


@pytest.fixture()
def pyav_backend(monkeypatch):
    monkeypatch.setitem(sys.modules, "av", _FakeAV())
    return PyAVBackend()


def test_pyav_get_meta(pyav_backend):
    meta = pyav_backend.get_meta("x.mp4")
    assert meta == VideoMeta(SRC_DUR, SRC_FPS, SRC_RATE, SRC_W, SRC_H)


def test_pyav_video_seek_grid_and_duplication(pyav_backend):
    # start 1.3 s (keyframe lead-in from 1.0 s must be skipped), 16 fps
    # target from an 8 fps source -> every source frame appears twice
    start, dur, fps = 1.3, 0.5, 16.0
    out = pyav_backend.load_video("x.mp4", start, dur, fps)
    n = int(np.ceil(dur * fps))
    assert out.shape == (n, SRC_H, SRC_W, 3)
    for i in range(n):
        want_t = start + i / fps
        k = int(np.floor(want_t * SRC_FPS + 1e-9))  # latest frame <= grid pt
        np.testing.assert_array_equal(out[i], frame_at(k))


def test_pyav_video_tail_clamp(pyav_backend):
    # window past the end of the stream: grid points beyond the last
    # decoded frame clamp to it (fps_grid_indices clip semantics)
    out = pyav_backend.load_video("x.mp4", SRC_DUR - 0.25, 0.5, SRC_FPS)
    assert out.shape[0] == int(np.ceil(0.5 * SRC_FPS))
    last_k = int(SRC_DUR * SRC_FPS) - 1
    np.testing.assert_array_equal(out[-1], frame_at(last_k))


def test_pyav_audio_trims_keyframe_leadin(pyav_backend):
    # start 1.3 s: audio decode begins at the 1.0 s block boundary; the
    # 0.3 s lead-in must be trimmed so sample 0 is exactly start's sample
    start, dur = 1.3, 0.5
    sig = pyav_backend.load_audio("x.mp4", start, dur, SRC_RATE)
    n = int(dur * SRC_RATE)
    assert sig.shape == (n,)
    lo = int(round(start * SRC_RATE))
    want = audio_sample(np.arange(lo, lo + n)).astype(np.float32) / 32768.0
    np.testing.assert_allclose(sig, want)


def test_pyav_audio_zero_pads_past_stream_end(pyav_backend):
    start, dur = SRC_DUR - 0.25, 0.5
    sig = pyav_backend.load_audio("x.mp4", start, dur, SRC_RATE)
    n = int(dur * SRC_RATE)
    n_real = int(0.25 * SRC_RATE)
    lo = int(round(start * SRC_RATE))
    want = audio_sample(np.arange(lo, lo + n_real)).astype(np.float32) / 32768.0
    np.testing.assert_allclose(sig[:n_real], want)
    np.testing.assert_array_equal(sig[n_real:], np.zeros(n - n_real, np.float32))


# ---------------------------------------------------------------------------
# fake ffmpeg/ffprobe CLI
# ---------------------------------------------------------------------------

FAKE_FFPROBE = textwrap.dedent(f"""\
    #!{sys.executable}
    import json, sys
    with open(sys.argv[-1] + ".probe_count", "a") as f:
        f.write("x")
    print(json.dumps({{
        "streams": [
            {{"codec_type": "video", "avg_frame_rate": "{int(SRC_FPS)}/1",
              "width": {SRC_W}, "height": {SRC_H}}},
            {{"codec_type": "audio", "sample_rate": "{SRC_RATE}"}},
        ],
        "format": {{"duration": "{SRC_DUR}"}},
    }}))
""")

FAKE_FFMPEG = textwrap.dedent(f"""\
    #!{sys.executable}
    import sys
    import numpy as np

    SRC_FPS, SRC_DUR, SRC_W, SRC_H, SRC_RATE = {SRC_FPS}, {SRC_DUR}, {SRC_W}, {SRC_H}, {SRC_RATE}

    def frame_at(k):
        f = np.empty((SRC_H, SRC_W, 3), np.uint8)
        for c in range(3):
            f[:, :, c] = (k * (7 + 6 * c)) % 251
        return f

    def audio_sample(i):
        return ((np.asarray(i) * 37) % 20001 - 10000).astype(np.int16)

    args = sys.argv[1:]
    def val(flag):
        return args[args.index(flag) + 1] if flag in args else None

    start = float(val("-ss") or 0.0)
    dur = float(val("-t") or SRC_DUR)
    end = min(start + dur, SRC_DUR)
    out = sys.stdout.buffer
    if val("-f") == "rawvideo":
        fps = float(val("-vf").split("=")[1])
        # ffmpeg's fps filter: one output frame per grid point in
        # [start, end), each the latest source frame at-or-before it
        t = start
        while t < end - 1e-9:
            k = min(int(np.floor(t * SRC_FPS + 1e-9)), int(SRC_DUR * SRC_FPS) - 1)
            out.write(frame_at(k).tobytes())
            t += 1.0 / fps
    else:
        assert val("-f") == "s16le" and val("-ac") == "1"
        rate = int(val("-ar"))
        assert rate == SRC_RATE
        lo = int(round(start * SRC_RATE))
        hi = int(round(end * SRC_RATE))
        out.write(audio_sample(np.arange(lo, hi)).tobytes())
""")


@pytest.fixture()
def ffmpeg_backend(tmp_path, monkeypatch):
    for name, src in (("ffprobe", FAKE_FFPROBE), ("ffmpeg", FAKE_FFMPEG)):
        p = tmp_path / name
        p.write_text(src)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    return FFmpegCLIBackend()


def test_ffmpeg_get_meta_and_lru(ffmpeg_backend, tmp_path):
    path = str(tmp_path / "y.mp4")
    meta = ffmpeg_backend.get_meta(path)
    assert meta == VideoMeta(SRC_DUR, SRC_FPS, SRC_RATE, SRC_W, SRC_H)
    ffmpeg_backend.get_meta(path)
    ffmpeg_backend.get_meta(path)
    # ffprobe spawned exactly once: the LRU served the repeats
    assert len((tmp_path / "y.mp4.probe_count").read_text()) == 1


def test_ffmpeg_meta_cache_evicts(ffmpeg_backend, tmp_path, monkeypatch):
    monkeypatch.setattr(FFmpegCLIBackend, "META_CACHE_MAX", 2)
    for name in ("a.mp4", "b.mp4", "c.mp4"):
        ffmpeg_backend.get_meta(str(tmp_path / name))
    assert len(ffmpeg_backend._meta_cache) == 2
    ffmpeg_backend.get_meta(str(tmp_path / "a.mp4"))  # evicted -> re-probe
    assert len((tmp_path / "a.mp4.probe_count").read_text()) == 2


def test_ffmpeg_video_window_and_content(ffmpeg_backend, tmp_path):
    start, dur, fps = 1.25, 0.5, 16.0
    out = ffmpeg_backend.load_video(str(tmp_path / "y.mp4"), start, dur, fps)
    n = int(np.ceil(dur * fps))
    assert out.shape == (n, SRC_H, SRC_W, 3)
    for i in range(n):
        k = int(np.floor((start + i / fps) * SRC_FPS + 1e-9))
        np.testing.assert_array_equal(out[i], frame_at(k))


def test_ffmpeg_video_pads_short_stream(ffmpeg_backend, tmp_path):
    # window runs past the file: ffmpeg emits fewer frames and the
    # backend pads by repeating the last one
    start, dur, fps = SRC_DUR - 0.25, 1.0, SRC_FPS
    out = ffmpeg_backend.load_video(str(tmp_path / "y.mp4"), start, dur, fps)
    assert out.shape[0] == int(np.ceil(dur * fps))
    last_k = int(SRC_DUR * SRC_FPS) - 1
    np.testing.assert_array_equal(out[-1], frame_at(last_k))
    np.testing.assert_array_equal(out[2], out[3])  # the repeated pad


def test_ffmpeg_audio_trim_and_pad(ffmpeg_backend, tmp_path):
    path = str(tmp_path / "y.mp4")
    start, dur = 1.25, 0.5
    sig = ffmpeg_backend.load_audio(path, start, dur, SRC_RATE)
    n = int(dur * SRC_RATE)
    lo = int(round(start * SRC_RATE))
    want = audio_sample(np.arange(lo, lo + n)).astype(np.float32) / 32768.0
    np.testing.assert_allclose(sig, want)

    # short tail zero-padded to the exact target length
    start = SRC_DUR - 0.25
    sig = ffmpeg_backend.load_audio(path, start, 0.5, SRC_RATE)
    n_real = int(0.25 * SRC_RATE)
    assert sig.shape == (int(0.5 * SRC_RATE),)
    np.testing.assert_array_equal(sig[n_real:], 0.0)


def test_pyav_fixed_decode_size(monkeypatch):
    """out_hw: frames come back cover-scaled + center-cropped to a fixed
    (H, W) regardless of source resolution, and frame_hw advertises it
    (static shapes for collate/jit; dense-eval fallback shape source)."""
    monkeypatch.setitem(sys.modules, "av", _FakeAV())
    be = PyAVBackend(out_hw=(16, 20))
    assert be.frame_hw == (16, 20)
    out = be.load_video("x.mp4", 0.0, 0.5, 8.0)
    assert out.shape == (4, 16, 20, 3) and out.dtype == np.uint8
