#!/usr/bin/env python
"""Deployment inference: classify raw video files with a finetuned model.

The reference's only inference surface is the benchmark eval loop over a
registered dataset (eval-action-recg.py:101-110); there is no way to run
a trained action-recognition model on arbitrary media. This CLI closes
the train -> finetune -> serve loop: it restores a finetuned checkpoint
produced by `eval_action_recg.py` (the per-epoch `orbax` or the
best-top-1 `orbax_best` manager) and classifies raw video files with the
dense protocol — uniformly spaced clips, per-clip softmax, averaged per
video (reference protocol: eval-action-recg.py:101-110 + softmax-mean,
utils/eval_utils.py:154-157).

Usage:
    python scripts/classify.py \
        configs/benchmark/ucf/8at16-fold1.yaml \
        configs/main/avid/kinetics/Cross-N1024.yaml \
        video1.mp4 video2.avi \
        [--fold 1] [--ckpt best|last] [--clips 10] [--topk 5] \
        [--classes names.txt] [--set key=value ...]

Decode goes through the configured backend (`dataset.backend`, PyAV /
ffmpeg-CLI / synthetic; `dataset.decode_size` applies); preprocessing is
the same jitted eval path the benchmark numbers are measured with. Class
names come from `--classes` (one per line), or from the benchmark
dataset's listing when `dataset.root` is readable, else raw indices.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("eval_cfg", help="benchmark YAML the model was finetuned with")
    p.add_argument("model_cfg", help="pretrain YAML naming the run dir")
    p.add_argument("videos", nargs="+", help="video files to classify")
    p.add_argument("--fold", type=int, default=None)
    p.add_argument("--ckpt", choices=["best", "last"], default="best",
                   help="best: orbax_best (top-1 on the benchmark test "
                        "split); last: newest per-epoch save")
    p.add_argument("--clips", type=int, default=None,
                   help="clips per video (default: the config's "
                        "test_dense clips_per_video, else 10)")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--classes", default=None,
                   help="optional class-name file, one name per line")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    return p


def _restore_finetuned(eval_dir: str, which: str):
    """Raw state dict (params/batch_stats) from the eval run's managers."""
    from avid_cma_tpu.train.checkpoint import CheckpointManager

    dirs = ["orbax_best", "orbax"] if which == "best" else ["orbax"]
    for d in dirs:
        path = os.path.join(eval_dir, d)
        if os.path.isdir(path):
            raw = CheckpointManager(path).restore_raw()
            if raw is not None:
                return raw, d
    raise FileNotFoundError(
        f"no finetuned checkpoint under {eval_dir} "
        "(run eval_action_recg.py first)"
    )


def _class_names(eval_cfg, fold, n_classes):
    """--classes file > benchmark dataset listing > bare indices."""
    from avid_cma_tpu.train import builders

    try:
        ds = builders.build_dataset(
            eval_cfg.dataset, eval_cfg.dataset.test,
            return_audio=False, return_labels=True, fold=fold,
        )
        names = list(getattr(ds, "classes", []))
        if len(names) == n_classes:
            return names
    except Exception:
        pass
    return [f"class_{i}" for i in range(n_classes)]


def classify_videos(
    eval_cfg, model_cfg, paths, fold=None, which: str = "best",
    clips=None,
):
    """Returns (probs (N, n_classes) float32 per input video, ckpt_kind).
    Softmax-mean over `clips` uniformly spaced clips per video."""
    import jax

    from avid_cma_tpu.data.datasets import _guard_real_listing, _resolve_backend
    from avid_cma_tpu.data.video_db import VideoDataset
    from avid_cma_tpu.models.eval_wrappers import ClassificationWrapper
    from avid_cma_tpu.parallel.mesh import make_mesh
    from avid_cma_tpu.train import builders
    from avid_cma_tpu.train.eval_loop import (
        _load_backbone,
        _preprocess_frames,
        make_logits_fn,
    )

    db = eval_cfg.dataset
    fold = fold if fold is not None else int(db.get("fold", 1))
    eval_dir = os.path.join(
        model_cfg["model_dir"], model_cfg["name"],
        f"eval-{eval_cfg.benchmark['name']}", f"fold-{fold:02d}",
    )
    raw, ckpt_kind = _restore_finetuned(eval_dir, which)

    # architecture only — weights come from the finetuned checkpoint
    # above, so skip the (potentially large) pretrain checkpoint read
    backbone, _ = _load_backbone(model_cfg, weights=False)
    mcfg = eval_cfg.model
    model = ClassificationWrapper(
        feature_extractor=backbone,
        n_classes=int(mcfg["args"]["n_classes"]),
        feat_name=mcfg["args"].get("feat_name", "pool"),
        pooling_op=mcfg["args"].get("pooling_op"),
        use_dropout=bool(mcfg["args"].get("use_dropout", False)),
        dropout=float(mcfg["args"].get("dropout", 0.5)),
    )
    params = raw["params"]
    batch_stats = raw.get("batch_stats") or {}

    backend_arg = db.get("backend", "auto")
    be = _resolve_backend(
        backend_arg,
        out_hw=(tuple(int(x) for x in db["decode_size"])
                if db.get("decode_size") is not None else None),
    )
    _guard_real_listing(be, backend_arg)
    n_clips = int(clips if clips is not None
                  else db.get("test_dense", {}).get("clips_per_video", 10))
    ds = VideoDataset(
        backend=be, video_fns=list(paths), mode="video",
        video_clip_duration=float(
            db.get("video_clip_duration", db.get("clip_duration", 0.5))
        ),
        video_fps=float(db.get("video_fps", 16.0)),
        return_audio=False, return_labels=False,
        mode_clips_per_video=n_clips,
    )

    pp_cfg = builders.build_preprocess_config(db)
    mesh = make_mesh()
    logits_fn = make_logits_fn(model, mesh)

    probs = []
    for i in range(len(ds)):
        frames = np.asarray(ds[i]["frames"])  # (clips, T, H, W, C)
        pp = _preprocess_frames(
            {"frames": frames}, pp_cfg, jax.random.key(0), train=False
        )
        logits = np.asarray(logits_fn(params, batch_stats, pp))
        z = logits - logits.max(axis=-1, keepdims=True)
        p = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
        probs.append(p.mean(axis=0))  # dense protocol: mean over clips
    return np.stack(probs).astype(np.float32), ckpt_kind


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    from avid_cma_tpu import config as config_lib

    eval_cfg = config_lib.load(args.eval_cfg, overrides=args.overrides)
    model_cfg = config_lib.load(args.model_cfg).model
    # resolve the fold ONCE: checkpoint dir and class names must come
    # from the same fold (classify_videos defaults to the config's)
    fold = (args.fold if args.fold is not None
            else int(eval_cfg.dataset.get("fold", 1)))
    probs, ckpt_kind = classify_videos(
        eval_cfg, model_cfg, args.videos, fold=fold, which=args.ckpt,
        clips=args.clips,
    )
    if args.classes:
        names = [ln.strip() for ln in open(args.classes) if ln.strip()]
        if len(names) != probs.shape[1]:
            raise SystemExit(
                f"--classes {args.classes} has {len(names)} names but the "
                f"model outputs {probs.shape[1]} classes"
            )
    else:
        names = _class_names(eval_cfg, fold, probs.shape[1])
    print(f"checkpoint: {ckpt_kind}")
    for path, p in zip(args.videos, probs):
        order = np.argsort(p)[::-1][: args.topk]
        ranked = ", ".join(f"{names[i]}={p[i]:.3f}" for i in order)
        print(f"{path}: {ranked}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
