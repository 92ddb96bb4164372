#!/usr/bin/env python
"""Measure approx_max_k mining recall on REAL (trained) banks.

The 0.9954 recall figure in PERF.md was validated on Gaussian random
banks; trained banks are CLUSTERED (instances of a class collapse toward
class centroids), and the recall of TPU PartialReduce top-k depends on
the score distribution — near-ties inside a cluster are exactly where an
approximate reduction can drop a true top-k member. The AudioSet recipes
ship with `sampling_args.exact: false`, so this is a production setting,
not a curiosity.

Two sources, both reported:
  * --run-dir: banks from a trained orbax run (e.g. the learning proof's
    learning-proof-cma run) — real clustered structure, small N.
  * synthetic clustered banks at CMA scale (--clustered-n): unit-norm
    class centroids + within-class noise at --spread, mimicking a
    trained bank's geometry at N where approx mining actually matters.

Recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries, for
the same `consensus` agreement the CMA sampler uses
(reference criterions/avid_cma.py:56-70).

Writes MINING_RECALL.json at the repo root (merged across invocations).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def recall_at_k(exact_idx: np.ndarray, approx_idx: np.ndarray) -> float:
    """Mean per-query overlap fraction of the two top-k sets."""
    n, k = exact_idx.shape
    hits = 0
    for e, a in zip(exact_idx, approx_idx):
        hits += len(set(e.tolist()) & set(a.tolist()))
    return hits / (n * k)


def measure(bank_v, bank_a, pos_k: int, tile: int) -> dict:
    import jax.numpy as jnp

    from avid_cma_tpu.criterions.mining import mine_positives

    bank_v = jnp.asarray(bank_v, jnp.float32)
    bank_a = jnp.asarray(bank_a, jnp.float32)
    t0 = time.perf_counter()
    ex = np.asarray(mine_positives(bank_v, bank_a, pos_k=pos_k,
                                   kind="consensus", tile=tile, exact=True))
    t_exact = time.perf_counter() - t0
    t0 = time.perf_counter()
    ap = np.asarray(mine_positives(bank_v, bank_a, pos_k=pos_k,
                                   kind="consensus", tile=tile, exact=False))
    t_approx = time.perf_counter() - t0
    return {
        "n": int(bank_v.shape[0]),
        "pos_k": pos_k,
        "recall_at_k": round(recall_at_k(ex, ap), 5),
        "exact_sweep_sec": round(t_exact, 2),
        "approx_sweep_sec": round(t_approx, 2),
    }


def clustered_banks(n: int, d: int, classes: int, spread: float, seed: int):
    """Unit-norm banks with class-centroid structure shared across the
    two modalities (the geometry AVID training produces: cross-modally
    aligned, within-class clustered)."""
    rng = np.random.default_rng(seed)
    cent = rng.standard_normal((classes, d)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = np.arange(n) % classes
    base = cent[labels]

    def noisy(s):
        r = np.random.default_rng(s)
        b = base + spread * r.standard_normal((n, d)).astype(np.float32)
        return b / np.linalg.norm(b, axis=1, keepdims=True)

    return noisy(seed + 1), noisy(seed + 2), labels


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--run-dir", default=None,
                    help="orbax run dir with trained banks "
                         "(e.g. /tmp/avid_cma_tpu/checkpoints/"
                         "learning-proof-cma)")
    ap.add_argument("--clustered-n", type=int, default=232_067,
                    help="synthetic clustered-bank size (0 to skip)")
    ap.add_argument("--classes", type=int, default=400)
    ap.add_argument("--spread", type=float, default=0.35,
                    help="within-class noise scale (0.35 ~ the trained "
                         "proof banks' within/between similarity ratio)")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--pos-k", type=int, default=32)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MINING_RECALL.json"))
    args = ap.parse_args(argv)

    results = {}
    if os.path.isfile(args.out):
        try:
            results = json.load(open(args.out))
        except Exception:
            results = {}

    if args.run_dir:
        from avid_cma_tpu.train.checkpoint import import_criterion_orbax

        bank = import_criterion_orbax(os.path.join(args.run_dir, "orbax"))
        k = min(args.pos_k, 8)  # small-N trained banks: match proof pos_k
        r = measure(bank.view1_mem, bank.view2_mem, pos_k=k,
                    tile=min(args.tile, int(bank.view1_mem.shape[0])))
        r["source"] = args.run_dir
        results["trained"] = r
        print("trained:", json.dumps(r))

    if args.clustered_n:
        bv, ba, _ = clustered_banks(args.clustered_n, args.dim,
                                    args.classes, args.spread, seed=0)
        r = measure(bv, ba, pos_k=args.pos_k, tile=args.tile)
        r["source"] = (f"clustered synthetic (classes={args.classes}, "
                       f"spread={args.spread})")
        results["clustered"] = r
        print("clustered:", json.dumps(r))

        bv, ba, _ = clustered_banks(args.clustered_n, args.dim,
                                    args.classes, 1e9, seed=3)
        r = measure(bv, ba, pos_k=args.pos_k, tile=args.tile)
        r["source"] = "gaussian (spread->inf control, the round-4 setting)"
        results["gaussian"] = r
        print("gaussian:", json.dumps(r))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
