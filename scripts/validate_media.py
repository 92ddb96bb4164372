#!/usr/bin/env python
"""Preflight: validate real media against the decode backends BEFORE a run.

The first host with codecs + mounted media should validate
`data/decode.py` in minutes, not discover a seek-unit or duration bug at
step 1 of a 2M-clip epoch (reference decode surface:
utils/ioutils/av_wrappers.py:17-113). Decodes a sample of files through
the SAME backend + window logic the datasets use and reports:

  * per-file failures (open/meta/video/audio), with the exception
  * fps / duration / resolution histograms across the sample
  * decode latency histograms (meta / video / audio ms per clip) -> the
    worker-count budget for the input pipeline (PERF.md)
  * sanity flags: zero/absurd durations, fps far from the config's
    target, missing audio streams, all-black / constant frames

Usage:
  # sample 50 files from a dataset config (listing resolved exactly as
  # training would resolve it):
  python scripts/validate_media.py --config configs/main/avid/kinetics/Cross-N1024.yaml -n 50

  # or raw paths / globs:
  python scripts/validate_media.py --paths '/data/k400/train/*/*.mp4' -n 20
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _percentiles(xs):
    if not xs:
        return {}
    a = np.asarray(xs, np.float64)
    return {
        "min": round(float(a.min()), 2),
        "p50": round(float(np.percentile(a, 50)), 2),
        "p90": round(float(np.percentile(a, 90)), 2),
        "max": round(float(a.max()), 2),
    }


def validate(
    paths, backend, video_clip_duration=0.5, video_fps=16.0,
    audio_clip_duration=2.0, audio_fps=24000, check_audio=True,
):
    """Decode each path once (meta + one mid-file video/audio window).
    Returns the report dict; prints nothing."""
    report = {
        "n_files": len(paths),
        "failures": [],
        "flags": [],
        "meta": {"duration_s": [], "video_fps": [], "audio_fps": [],
                 "height": [], "width": []},
        "latency_ms": {"meta": [], "video": [], "audio": []},
    }
    for path in paths:
        try:
            t0 = time.perf_counter()
            meta = backend.get_meta(path)
            report["latency_ms"]["meta"].append(
                (time.perf_counter() - t0) * 1e3
            )
        except Exception as e:
            report["failures"].append(
                {"path": path, "stage": "meta", "error": repr(e)}
            )
            continue
        report["meta"]["duration_s"].append(meta.duration)
        report["meta"]["video_fps"].append(meta.video_fps)
        report["meta"]["audio_fps"].append(meta.audio_fps)
        report["meta"]["height"].append(meta.height)
        report["meta"]["width"].append(meta.width)
        if meta.duration <= 0 or meta.duration > 36000:
            # a failure, not a flag: no decode can be validated for this
            # file, so it must not count toward summary["ok"] or let the
            # preflight exit 0 (a corpus of duration-0 containers would
            # otherwise "pass" without exercising decode at all)
            report["failures"].append({
                "path": path, "stage": "meta",
                "error": f"absurd duration {meta.duration}",
            })
            continue
        # mid-file window: exercises seek, not just sequential decode
        start = max(0.0, meta.duration / 2 - video_clip_duration / 2)
        try:
            t0 = time.perf_counter()
            frames = backend.load_video(
                path, start, video_clip_duration, video_fps
            )
            report["latency_ms"]["video"].append(
                (time.perf_counter() - t0) * 1e3
            )
            want_t = int(np.ceil(video_clip_duration * video_fps))
            if frames.shape[0] != want_t:
                report["flags"].append({
                    "path": path,
                    "flag": f"video frames {frames.shape[0]} != {want_t}",
                })
            if float(frames.astype(np.float32).std()) < 1.0:
                report["flags"].append(
                    {"path": path, "flag": "near-constant frames"}
                )
        except Exception as e:
            report["failures"].append(
                {"path": path, "stage": "video", "error": repr(e)}
            )
        if not check_audio:
            continue
        if meta.audio_fps <= 0:
            report["flags"].append({"path": path, "flag": "no audio stream"})
            continue
        try:
            astart = max(0.0, meta.duration / 2 - audio_clip_duration / 2)
            t0 = time.perf_counter()
            sig = backend.load_audio(
                path, astart, audio_clip_duration, audio_fps
            )
            report["latency_ms"]["audio"].append(
                (time.perf_counter() - t0) * 1e3
            )
            want_n = int(audio_clip_duration * audio_fps)
            if sig.shape[0] != want_n:
                report["flags"].append({
                    "path": path,
                    "flag": f"audio samples {sig.shape[0]} != {want_n}",
                })
            if float(np.abs(sig).max()) == 0.0:
                report["flags"].append(
                    {"path": path, "flag": "silent audio window"}
                )
        except Exception as e:
            report["failures"].append(
                {"path": path, "stage": "audio", "error": repr(e)}
            )
    report["summary"] = {
        "ok": len(paths) - len(report["failures"]),
        "failed": len(report["failures"]),
        "flagged": len(report["flags"]),
        "duration_s": _percentiles(report["meta"]["duration_s"]),
        "video_fps": _percentiles(report["meta"]["video_fps"]),
        "decode_ms": {
            k: _percentiles(v) for k, v in report["latency_ms"].items()
        },
    }
    v_ms = report["latency_ms"]["video"]
    a_ms = report["latency_ms"]["audio"]
    if v_ms:
        # ms per (video+audio) clip -> workers needed to sustain a target
        per_clip = float(np.percentile(v_ms, 50)) + (
            float(np.percentile(a_ms, 50)) if a_ms else 0.0
        )
        report["summary"]["ms_per_clip_p50"] = round(per_clip, 2)
        report["summary"]["workers_for_500cps"] = int(
            np.ceil(500.0 * per_clip / 1e3)
        )
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", help="training YAML; sample from its "
                    "dataset listing exactly as the run would")
    ap.add_argument("--paths", nargs="*", default=[],
                    help="explicit media paths or globs")
    ap.add_argument("-n", "--sample", type=int, default=50)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pyav", "ffmpeg"])
    ap.add_argument("--no-audio", action="store_true")
    ap.add_argument("--json", dest="json_out", help="write full report here")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from avid_cma_tpu.data.decode import make_backend

    video_dur, video_fps = 0.5, 16.0
    audio_dur, audio_fps = 2.0, 24000
    if args.config:
        import avid_cma_tpu  # noqa: F401  (registries)
        from avid_cma_tpu import config as config_lib
        from avid_cma_tpu.train import builders

        cfg = config_lib.load(args.config)
        db = cfg.dataset
        ds = builders.build_dataset(db, db["train"], return_audio=False)
        paths = [f.decode("utf-8") for f in ds.video_fns]
        video_dur = float(db.get("video_clip_duration",
                                 db.get("clip_duration", 0.5)))
        video_fps = float(db.get("video_fps", 16.0))
        audio_dur = float(db.get("audio_clip_duration", 2.0))
        audio_fps = int(db.get("audio_fps", 24000))
        backend = ds.backend
    else:
        paths = []
        for p in args.paths:
            paths.extend(sorted(glob.glob(p)) if any(
                ch in p for ch in "*?[") else [p])
        if not paths:
            ap.error("need --config or --paths")
        backend = make_backend(args.backend)
    from avid_cma_tpu.data.decode import SyntheticBackend

    if isinstance(backend, SyntheticBackend):
        print(
            "ERROR: no real decode backend available (PyAV and ffmpeg both "
            "absent) — a synthetic backend cannot validate real media.",
            file=sys.stderr,
        )
        return 2
    rng = np.random.default_rng(args.seed)
    if len(paths) > args.sample:
        paths = [paths[i] for i in sorted(
            rng.choice(len(paths), args.sample, replace=False))]

    report = validate(
        paths, backend, video_clip_duration=video_dur, video_fps=video_fps,
        audio_clip_duration=audio_dur, audio_fps=audio_fps,
        check_audio=not args.no_audio,
    )
    for f in report["failures"]:
        print(f"FAIL [{f['stage']}] {f['path']}: {f['error']}")
    for f in report["flags"]:
        print(f"FLAG {f['path']}: {f['flag']}")
    print(json.dumps(report["summary"], indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)
    return 1 if report["failures"] else 0


if __name__ == "__main__":
    sys.exit(main())
