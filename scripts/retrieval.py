#!/usr/bin/env python
"""Cross-modal retrieval evaluation over extracted NCE-space embeddings.

Consumes the .npz written by `scripts/extract_features.py --space nce`
(L2-normalized projection-head embeddings of both modalities — the space
the memory banks are built in, reference criterions/avid.py:47-56) and
reports video->audio and audio->video recall@K and median rank. This is
the retrieval counterpart of the serve surfaces: the AVID training
objective IS cross-modal instance matching, so retrieval quality is the
most direct probe of a pretrained checkpoint.

Usage:
    python scripts/extract_features.py <data.yaml> <model.yaml> \
        --space nce --out feats.npz
    python scripts/retrieval.py feats.npz [--ks 1 5 10]

Scores are cosine similarities (embeddings arrive unit-norm); the true
match for item i is the other modality's row i (same dataset index).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def recall_metrics(query: np.ndarray, gallery: np.ndarray, ks=(1, 5, 10)):
    """query/gallery: (N, D) row-aligned (row i of each is the true
    pair). Returns {'R@k': pct, ..., 'median_rank': r} with rank 1 =
    best. Ties are scored pessimistically (true match ranks below every
    strictly-greater and equal-scoring impostor) so degenerate constant
    embeddings can't fake R@k."""
    if query.shape != gallery.shape:
        raise ValueError(f"shape mismatch: {query.shape} vs {gallery.shape}")
    n = query.shape[0]
    sim = query @ gallery.T  # (N, N)
    true_score = np.diag(sim)
    # pessimistic rank: 1 + #{j != i : sim[i, j] >= sim[i, i]}
    ge = (sim >= true_score[:, None]).sum(axis=1)  # counts self once
    ranks = ge  # self's own >= hit stands in for the +1
    out = {f"R@{k}": 100.0 * float((ranks <= k).mean()) for k in ks}
    out["median_rank"] = float(np.median(ranks))
    out["n"] = n
    return out


def evaluate(npz_path: str, ks=(1, 5, 10)):
    """{'v2a': {...}, 'a2v': {...}} from an extract_features --space nce
    output (keys feat_video / feat_audio, row-aligned by 'index')."""
    data = np.load(npz_path)
    for key in ("feat_video", "feat_audio"):
        if key not in data:
            raise KeyError(
                f"{npz_path} has no '{key}' — produce it with "
                "extract_features.py --space nce"
            )
    v, a = data["feat_video"], data["feat_audio"]
    if "index" in data:
        # multi-host extraction pads shards by REPEATING indices; the
        # duplicate rows create exact-score ties that the pessimistic
        # rank rule scores as misses — dedup by dataset index first
        _, keep = np.unique(np.asarray(data["index"]), return_index=True)
        if keep.shape[0] != v.shape[0]:
            keep = np.sort(keep)
            v, a = v[keep], a[keep]
    return {
        "v2a": recall_metrics(v, a, ks),
        "a2v": recall_metrics(a, v, ks),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("npz", help="extract_features.py --space nce output")
    p.add_argument("--ks", type=int, nargs="+", default=[1, 5, 10])
    args = p.parse_args(argv)
    results = evaluate(args.npz, ks=tuple(args.ks))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
