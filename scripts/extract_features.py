#!/usr/bin/env python
"""Standalone feature extraction: pretrained backbone -> embeddings.

Capability reference: the reference exposes intermediate taps via
`return_embs` (models/video.py:44-54) and consumes them only inside the
eval wrappers (utils/eval_utils.py:298-329) — there is no standalone
extraction surface. This CLI is the production entry for retrieval /
external-probe workflows: it runs a dataset split through a pretrained
video backbone and writes per-item (or per-video, for dense splits)
embeddings at the requested taps to an .npz.

Usage:
    python scripts/extract_features.py \
        <data_cfg.yaml> <model_cfg.yaml> \
        --split test --taps pool conv5x --out feats.npz \
        [--fold 1] [--max-items N] [--set key=value ...]

`data_cfg` is any config with a `dataset` block (the benchmark YAMLs work
as-is); `model_cfg` is a pretrain config whose run directory holds a
checkpoint (`checkpoint.pth.tar` or orbax/). Conv taps are reduced to
vectors with AdaptiveMaxPool3d(1) (the backbone's own head pooling);
`pool` is already a vector. Dense ('video' mode) splits are averaged
over their uniformly spaced clips, matching the dense-eval protocol.

`--space nce` switches to the L2-normalized projection-head embeddings
of BOTH modalities — the aligned 128-d space the memory banks are built
in (reference criterions/avid.py:47-56) and the space cross-modal
retrieval (video->audio / audio->video) operates in. Requires a dataset
that returns audio (Kinetics/AudioSet, not UCF/HMDB).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("data_cfg")
    p.add_argument("model_cfg")
    p.add_argument("--split", default="test",
                   help="dataset split block to read (train/test/...)")
    p.add_argument("--taps", nargs="+", default=["pool"],
                   help="backbone taps: conv1 conv2x..conv5x pool")
    p.add_argument("--space", choices=["taps", "nce"], default="taps",
                   help="'taps': video-backbone intermediate taps; "
                        "'nce': the L2-normalized projection-head "
                        "embeddings of BOTH modalities — the aligned "
                        "space the memory banks live in (cross-modal "
                        "retrieval)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--fold", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="override dataset.batch_size for extraction")
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--set", dest="overrides", action="append", default=[])
    return p


def _load_full_model(model_cfg):
    """Full pretrained AVWrapper (backbones + projection heads) + its
    imported variables, from .pth.tar or a framework orbax run."""
    from avid_cma_tpu.registry import MODELS
    from avid_cma_tpu.train.checkpoint import import_model_pth_tar

    model = MODELS.get(model_cfg["arch"])(**dict(model_cfg["args"]))
    base = os.path.join(model_cfg["model_dir"], model_cfg["name"])
    pth = os.path.join(base, "checkpoint.pth.tar")
    orbax_dir = os.path.join(base, "orbax")
    if os.path.isfile(pth):
        return model, import_model_pth_tar(pth)
    if os.path.isdir(orbax_dir):
        from avid_cma_tpu.train.checkpoint import CheckpointManager

        raw = CheckpointManager(orbax_dir).restore_raw()
        if raw is not None:
            return model, {
                "params": raw["params"],
                "batch_stats": raw.get("batch_stats") or {},
            }
    return model, None


def extract_features(
    data_cfg, model_cfg, split: str = "test", taps=("pool",),
    space: str = "taps", fold=None, batch_size=None, max_items=None,
    num_workers: int = 4,
):
    """Returns {name: (N, D) float32}, labels (N,) int64 or None, and the
    per-item dataset indices (N,) actually extracted. space='taps':
    names are video-backbone taps; space='nce': names are
    'video'/'audio', the L2-normalized head embeddings (the space the
    memory banks are built in, reference criterions/avid.py:47-56)."""
    import jax
    import jax.numpy as jnp

    from avid_cma_tpu.ops.pooling import adaptive_max_pool
    from avid_cma_tpu.data.loader import DataLoader
    from avid_cma_tpu.data.pipelines import preprocess_batch
    from avid_cma_tpu.train import builders
    from avid_cma_tpu.train.eval_loop import _load_backbone

    nce = space == "nce"
    db = data_cfg.dataset
    split_cfg = db[split]
    has_labels = db["name"] not in ("audioset",)
    ds = builders.build_dataset(
        db, split_cfg, return_audio=nce, return_labels=has_labels,
        fold=fold,
    )
    if nce:
        backbone, variables = _load_full_model(model_cfg)
    else:
        backbone, variables = _load_backbone(model_cfg)
    if variables is None:
        raise FileNotFoundError(
            "no checkpoint.pth.tar or orbax/ under "
            f"{os.path.join(model_cfg['model_dir'], model_cfg['name'])}"
        )
    pp_cfg = builders.build_preprocess_config(db)
    taps = ["video", "audio"] if nce else list(taps)

    def _flatten_clips(x):
        """(B, clips, ...) -> (B*clips, ...) or passthrough; returns
        (x, dense, b, k)."""
        dense = x.ndim >= 3 and split_cfg.get("mode", "clip") == "video"
        if dense:
            b, k = x.shape[:2]
            return x.reshape((b * k,) + x.shape[2:]), True, b, k
        return x, False, x.shape[0], 1

    @jax.jit
    def embed(variables, frames, audio=None):
        frames, dense, b, k = _flatten_clips(frames)
        raw = {"frames": frames}
        if nce:
            a, _, _, _ = _flatten_clips(audio)
            raw["audio"] = a
        pp = preprocess_batch(jax.random.key(0), raw, pp_cfg, train=False)
        out = {}
        if nce:
            v_emb, a_emb = backbone.apply(
                variables, pp["frames"], pp["audio"], train=False
            )
            for t, e in (("video", v_emb), ("audio", a_emb)):
                e = e.astype(jnp.float32)
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12
                )
                if dense:
                    e = e.reshape(b, k, -1).mean(axis=1)
                out[t] = e
            return out
        embs = backbone.apply(
            variables, pp["frames"], train=False, return_embs=True
        )
        for t in taps:
            e = embs[t]
            if e.ndim > 2:  # conv tap (B', T, H, W, C) -> (B', C)
                e = adaptive_max_pool(
                    e, (1,) * (e.ndim - 2), tuple(range(1, e.ndim - 1))
                ).reshape(e.shape[0], -1)
            e = e.astype(jnp.float32)
            if dense:  # dense protocol: mean over the video's clips
                e = e.reshape(b, k, -1).mean(axis=1)
            out[t] = e
        return out

    bs = int(batch_size or db.get("batch_size", 8))
    is_dense = split_cfg.get("mode", "clip") == "video"
    if is_dense:
        bs = 1  # one video per row; clips fill the device batch
    # under multi-host init each process extracts its round-robin shard
    # (write per-process output paths; there is no cross-process merge)
    loader = DataLoader(
        ds, batch_size=bs, shuffle=False, drop_last=False,
        num_workers=max(num_workers, 1),
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    feats = {t: [] for t in taps}
    labels, indices = [], []
    seen = 0
    for batch in loader:
        if nce:
            out = embed(variables, np.asarray(batch["frames"]),
                        np.asarray(batch["audio"]))
        else:
            out = embed(variables, np.asarray(batch["frames"]))
        for t in taps:
            feats[t].append(np.asarray(out[t]))
        if "label" in batch:
            labels.append(np.asarray(batch["label"]).reshape(-1))
        idx = np.asarray(batch["index"])
        if idx.ndim > 1:  # dense mode: per-clip indices, one video per row
            idx = idx[:, 0]
        indices.append(idx.reshape(-1))
        seen += int(idx.reshape(-1).shape[0])
        if max_items is not None and seen >= max_items:
            break
    feats = {t: np.concatenate(v)[:max_items] for t, v in feats.items()}
    labels_arr = (
        np.concatenate(labels)[:max_items] if labels else None
    )
    indices_arr = np.concatenate(indices)[:max_items]
    return feats, labels_arr, indices_arr


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    from avid_cma_tpu import config as config_lib

    data_cfg = config_lib.load(args.data_cfg, overrides=args.overrides)
    model_cfg = config_lib.load(args.model_cfg).model
    feats, labels, indices = extract_features(
        data_cfg, model_cfg, split=args.split, taps=args.taps,
        space=args.space, fold=args.fold, batch_size=args.batch_size,
        max_items=args.max_items, num_workers=args.num_workers,
    )
    payload = {f"feat_{t}": v for t, v in feats.items()}
    payload["index"] = indices
    if labels is not None:
        payload["label"] = labels
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **payload)
    n = indices.shape[0]
    dims = {t: v.shape[1:] for t, v in feats.items()}
    print(f"wrote {args.out}: {n} items, taps {dims}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
