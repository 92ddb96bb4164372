"""Opt-in REAL-codec decode tests (auto-enabled when codecs exist).

This image has neither libav nor an ffmpeg binary, so
tests/test_decode_backends.py runs the backends against interface-exact
fakes. These tests are the real-media counterpart: on the first host
where `import av` succeeds or a real ffmpeg binary is on PATH, they
synthesize actual 2-4 s media fixtures (h264 + aac in mp4) whose content
encodes absolute time, then run the SAME semantic assertions as the
fake-backed suite — window shapes, fps-grid mapping, seek lead-in trim,
tail padding — plus the scripts/validate_media.py preflight. Here they
skip; there they validate data/decode.py in minutes.

Reference decode surface: utils/ioutils/av_wrappers.py:17-113.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from avid_cma_tpu.data.decode import (
    FFmpegCLIBackend,
    PyAVBackend,
    make_backend,
)

# fixture content: pure functions of absolute time
SRC_FPS = 8
SRC_DUR = 4.0
SRC_W = SRC_H = 64
SRC_RATE = 16000
TONE_HZ = 1000.0
AMP_LO, AMP_HI, AMP_STEP_T = 0.2, 0.8, 2.0  # amplitude step at t=2 s


def _have_pyav() -> bool:
    try:
        import av  # noqa: F401

        return True
    except Exception:
        return False


def _have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None and shutil.which(
        "ffprobe"
    ) is not None


pytestmark = pytest.mark.skipif(
    not (_have_pyav() or _have_ffmpeg()),
    reason="no real codec stack on this host (PyAV and ffmpeg both absent)",
)


def _luma_for_frame(k: int) -> int:
    """Solid-gray frame value for source frame k: recoverable through
    h264 (quantization error << the 8-level spacing)."""
    return 8 * k + 4


def _recover_k(frame: np.ndarray) -> int:
    return int(round((float(frame.astype(np.float32).mean()) - 4.0) / 8.0))


def _audio_wave() -> np.ndarray:
    t = np.arange(int(SRC_DUR * SRC_RATE)) / SRC_RATE
    amp = np.where(t < AMP_STEP_T, AMP_LO, AMP_HI)
    return (amp * np.sin(2 * np.pi * TONE_HZ * t)).astype(np.float32)


def _write_fixture_ffmpeg(path: str) -> None:
    n_frames = int(SRC_DUR * SRC_FPS)
    raw_v = b"".join(
        np.full((SRC_H, SRC_W, 3), _luma_for_frame(k), np.uint8).tobytes()
        for k in range(n_frames)
    )
    raw_a = (_audio_wave() * 32767).astype("<i2").tobytes()
    vpath, apath = path + ".rgb", path + ".pcm"
    with open(vpath, "wb") as f:
        f.write(raw_v)
    with open(apath, "wb") as f:
        f.write(raw_a)
    subprocess.run(
        [
            "ffmpeg", "-v", "error", "-y",
            "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{SRC_W}x{SRC_H}", "-r", str(SRC_FPS), "-i", vpath,
            "-f", "s16le", "-ar", str(SRC_RATE), "-ac", "1", "-i", apath,
            "-c:v", "libx264", "-crf", "10", "-pix_fmt", "yuv420p",
            "-g", str(SRC_FPS),  # keyframe every 1 s: exercises seek trim
            "-c:a", "aac", "-b:a", "128k",
            "-shortest", path,
        ],
        check=True, capture_output=True,
    )
    os.unlink(vpath)
    os.unlink(apath)


def _write_fixture_pyav(path: str) -> None:
    import av

    container = av.open(path, "w")
    vs = container.add_stream("libx264", rate=SRC_FPS)
    vs.width, vs.height = SRC_W, SRC_H
    vs.pix_fmt = "yuv420p"
    vs.options = {"crf": "10", "g": str(SRC_FPS)}
    as_ = container.add_stream("aac", rate=SRC_RATE)
    as_.layout = "mono"
    for k in range(int(SRC_DUR * SRC_FPS)):
        img = np.full((SRC_H, SRC_W, 3), _luma_for_frame(k), np.uint8)
        frame = av.VideoFrame.from_ndarray(img, format="rgb24")
        for pkt in vs.encode(frame):
            container.mux(pkt)
    # AAC encoders take fixed-size frames (frame_size, typically 1024
    # samples) — feeding the whole waveform as one AudioFrame is
    # rejected with EINVAL; chunk it with running pts
    pcm = (_audio_wave() * 32767).astype("<i2")
    step = int(getattr(as_.codec_context, "frame_size", 0) or 1024)
    for off in range(0, pcm.size, step):
        chunk = pcm[off : off + step].reshape(1, -1)
        aframe = av.AudioFrame.from_ndarray(
            chunk, format="s16", layout="mono"
        )
        aframe.sample_rate = SRC_RATE
        aframe.pts = off
        for pkt in as_.encode(aframe):
            container.mux(pkt)
    for stream in (vs, as_):
        for pkt in stream.encode(None):
            container.mux(pkt)
    container.close()


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("realmedia") / "fixture.mp4")
    if _have_ffmpeg():
        _write_fixture_ffmpeg(path)
    else:
        _write_fixture_pyav(path)
    return path


def _backends():
    out = []
    if _have_pyav():
        out.append("pyav")
    if _have_ffmpeg():
        out.append("ffmpeg")
    return out


@pytest.fixture(params=_backends() or ["none"])
def backend(request):
    if request.param == "pyav":
        return PyAVBackend()
    if request.param == "ffmpeg":
        return FFmpegCLIBackend()
    pytest.skip("no backend")


def test_meta(backend, media):
    meta = backend.get_meta(media)
    assert abs(meta.duration - SRC_DUR) < 0.35, meta
    assert abs(meta.video_fps - SRC_FPS) < 0.5, meta
    assert meta.audio_fps == SRC_RATE
    assert (meta.height, meta.width) == (SRC_H, SRC_W)


def test_video_window_fps_grid_and_seek_trim(backend, media):
    """start=1.3 s sits past the 1.0 s keyframe: decoded lead-in must be
    dropped; 16 fps target from an 8 fps source duplicates every frame.
    Frame identity is recovered from the coded luma (±1 source frame of
    pts/rounding tolerance; order must be non-decreasing)."""
    start, dur, fps = 1.3, 0.5, 16.0
    out = backend.load_video(media, start, dur, fps)
    n = int(np.ceil(dur * fps))
    assert out.shape == (n, SRC_H, SRC_W, 3) and out.dtype == np.uint8
    ks = [_recover_k(f) for f in out]
    want = [int(np.floor((start + i / fps) * SRC_FPS + 1e-9))
            for i in range(n)]
    assert all(abs(k - w) <= 1 for k, w in zip(ks, want)), (ks, want)
    assert all(b >= a for a, b in zip(ks, ks[1:])), ks
    # 16 fps from 8 fps: at least n//2 - 1 duplicated pairs
    dup = sum(b == a for a, b in zip(ks, ks[1:]))
    assert dup >= n // 2 - 1, ks


def test_video_tail_pad(backend, media):
    out = backend.load_video(media, SRC_DUR - 0.25, 1.0, float(SRC_FPS))
    assert out.shape[0] == SRC_FPS  # ceil(1.0 * 8)
    last_k = int(SRC_DUR * SRC_FPS) - 1
    assert abs(_recover_k(out[-1]) - last_k) <= 1, _recover_k(out[-1])


def test_audio_window_alignment_and_tone(backend, media):
    """Window [1.75, 2.25): the amplitude step encoded at t=2.0 s must
    land at the window's midpoint (seek lead-in correctly trimmed), and
    the dominant frequency must be the encoded tone."""
    start, dur = 1.75, 0.5
    sig = backend.load_audio(media, start, dur, SRC_RATE)
    n = int(dur * SRC_RATE)
    assert sig.shape == (n,)
    rms_lo = float(np.sqrt(np.mean(sig[: n // 4] ** 2)))
    rms_hi = float(np.sqrt(np.mean(sig[-n // 4:] ** 2)))
    assert abs(rms_lo - AMP_LO / np.sqrt(2)) < 0.07, rms_lo
    assert abs(rms_hi - AMP_HI / np.sqrt(2)) < 0.2, rms_hi
    spec = np.abs(np.fft.rfft(sig * np.hanning(n)))
    peak_hz = float(np.argmax(spec)) * SRC_RATE / n
    assert abs(peak_hz - TONE_HZ) < 30, peak_hz


def test_audio_tail_zero_pad(backend, media):
    sig = backend.load_audio(media, SRC_DUR - 0.25, 0.5, SRC_RATE)
    n = int(0.5 * SRC_RATE)
    assert sig.shape == (n,)
    # tail beyond the stream is (near-)silent; the real part is not.
    # aac decoders may emit a short fade tail, so compare energies.
    head = float(np.sqrt(np.mean(sig[: n // 4] ** 2)))
    tail = float(np.sqrt(np.mean(sig[-n // 8:] ** 2)))
    assert head > 0.2, head
    assert tail < 0.05, tail


def test_resample_rate_conversion(backend, media):
    """Request a different sample rate than the source: length must match
    the requested rate and the tone must survive resampling."""
    rate = 24000
    sig = backend.load_audio(media, 0.5, 1.0, rate)
    assert sig.shape == (rate,)
    spec = np.abs(np.fft.rfft(sig * np.hanning(rate)))
    peak_hz = float(np.argmax(spec))  # 1 s window -> bin == Hz
    assert abs(peak_hz - TONE_HZ) < 30, peak_hz


def test_fixed_decode_size(backend, media):
    be = type(backend)(out_hw=(32, 48))
    out = be.load_video(media, 0.5, 0.5, 8.0)
    assert out.shape == (4, 32, 48, 3)


def test_validate_media_preflight(backend, media):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts")
    )
    from validate_media import validate

    report = validate(
        [media], backend, video_clip_duration=0.5, video_fps=16.0,
        audio_clip_duration=1.0, audio_fps=SRC_RATE,
    )
    assert not report["failures"], report["failures"]
    assert report["summary"]["ok"] == 1
    assert report["summary"]["decode_ms"]["video"]


def test_dataset_end_to_end_on_real_media(backend, media, tmp_path):
    """The generic VideoDataset samples a clip from the real file through
    the real backend — the exact production path."""
    from avid_cma_tpu.data.video_db import VideoDataset

    ds = VideoDataset(
        backend=backend, video_fns=[media], labels=[0],
        video_clip_duration=0.5, video_fps=16.0,
        audio_clip_duration=1.0, audio_fps=SRC_RATE,
        return_labels=True,
    )
    item = ds[0]
    assert item["frames"].shape == (8, SRC_H, SRC_W, 3)
    assert item["audio"].shape == (SRC_RATE,)
    assert int(item["label"]) == 0
