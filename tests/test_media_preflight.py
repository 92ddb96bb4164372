"""Media preflight (scripts/validate_media.py) against fake backends.

The preflight's job is triage before a multi-day run: per-file failures
must be failures (nonzero exit, excluded from summary["ok"]), soft
anomalies must be flags, and the latency section must yield the
worker-count budget. Real-codec execution of the same surface lives in
tests/test_real_codecs.py (opt-in, codec-bearing hosts)."""

import numpy as np
import pytest

from avid_cma_tpu.data.decode import VideoMeta
from scripts.validate_media import validate


class FakeBackend:
    """Healthy 10 s 16 fps 24 kHz clip source with per-path overrides."""

    def __init__(self, meta_by_path=None, video_raises=(), audio_raises=(),
                 constant_video=(), silent_audio=()):
        self.meta_by_path = meta_by_path or {}
        self.video_raises = set(video_raises)
        self.audio_raises = set(audio_raises)
        self.constant_video = set(constant_video)
        self.silent_audio = set(silent_audio)

    def get_meta(self, path):
        meta = self.meta_by_path.get(path)
        if isinstance(meta, Exception):
            raise meta
        return meta or VideoMeta(10.0, 16.0, 24000, 320, 240)

    def load_video(self, path, start, duration, fps):
        if path in self.video_raises:
            raise RuntimeError("corrupt video stream")
        n = int(np.ceil(duration * fps))
        if path in self.constant_video:
            return np.full((n, 240, 320, 3), 7, np.uint8)
        rng = np.random.default_rng(abs(hash(path)) % 2**32)
        return rng.integers(0, 255, (n, 240, 320, 3), dtype=np.uint8)

    def load_audio(self, path, start, duration, sample_rate):
        if path in self.audio_raises:
            raise RuntimeError("corrupt audio stream")
        n = int(duration * sample_rate)
        if path in self.silent_audio:
            return np.zeros(n, np.float32)
        t = np.arange(n) / sample_rate
        return np.sin(2 * np.pi * 440 * t).astype(np.float32)


def test_healthy_corpus_all_ok():
    paths = [f"clip{i}.mp4" for i in range(4)]
    r = validate(paths, FakeBackend())
    assert r["failures"] == [] and r["flags"] == []
    assert r["summary"]["ok"] == 4 and r["summary"]["failed"] == 0
    # the worker-budget output PERF.md's decode accounting consumes
    assert r["summary"]["ms_per_clip_p50"] > 0
    assert r["summary"]["workers_for_500cps"] >= 1
    assert set(r["summary"]["decode_ms"]) == {"meta", "video", "audio"}


def test_absurd_duration_is_a_failure_not_a_flag():
    """A duration-0 container validates NO decode path — it must fail
    the preflight (exit nonzero), not pass as 'ok with a flag'."""
    be = FakeBackend(meta_by_path={
        "bad.mp4": VideoMeta(0.0, 16.0, 24000, 320, 240)
    })
    r = validate(["bad.mp4", "good.mp4"], be)
    assert r["summary"]["ok"] == 1 and r["summary"]["failed"] == 1
    (f,) = r["failures"]
    assert f["stage"] == "meta" and "duration" in f["error"]


def test_meta_exception_is_a_failure():
    be = FakeBackend(meta_by_path={"broken.mp4": OSError("moov atom")})
    r = validate(["broken.mp4"], be)
    assert r["summary"]["failed"] == 1
    assert r["failures"][0]["stage"] == "meta"


def test_video_failure_still_checks_audio():
    be = FakeBackend(video_raises={"v.mp4"}, audio_raises={"v.mp4"})
    r = validate(["v.mp4"], be)
    stages = sorted(f["stage"] for f in r["failures"])
    assert stages == ["audio", "video"]


@pytest.mark.parametrize(
    "kwargs,flag_substr",
    [({"constant_video": {"x.mp4"}}, "near-constant"),
     ({"silent_audio": {"x.mp4"}}, "silent audio")],
)
def test_soft_anomalies_are_flags(kwargs, flag_substr):
    r = validate(["x.mp4"], FakeBackend(**kwargs))
    assert r["failures"] == []
    assert any(flag_substr in f["flag"] for f in r["flags"])


def test_missing_audio_stream_flagged_and_skipped():
    be = FakeBackend(meta_by_path={
        "noaud.mp4": VideoMeta(10.0, 16.0, 0, 320, 240)
    })
    r = validate(["noaud.mp4"], be)
    assert r["failures"] == []
    assert any("no audio stream" in f["flag"] for f in r["flags"])
    assert r["latency_ms"]["audio"] == []
