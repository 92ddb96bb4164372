#!/usr/bin/env python
"""CMA mining-sweep benchmark at configurable corpus scale.

The reference fans the sweep out to an 8-GPU mp.Queue worker pool
(criterions/avid_cma.py:100-123); here it is one jitted blocked
matmul+top-k (criterions/mining.py). bench.py records the Kinetics-scale
exact sweep as a secondary metric; this script measures ANY (N, top-k,
exact|approx, tile) point — in particular the AudioSet-2M flagship scale
(N=1,784,108) with the approx_max_k path the shipped recipe enables
(`sampling_args.exact: false`), where the exact sweep is impractical.

Memory: the banks are 2 x N x D f32 (1.8 GB at AudioSet scale) plus a
(tile, N) f32 agreement block per modality — pick `--tile` so
3 x tile x N x 4 bytes fits alongside the banks (tile 128 at N=1.78M
on a 16 GB chip).

Usage:
  python scripts/mining_bench.py                        # Kinetics exact
  python scripts/mining_bench.py --n 1784108 --approx --tile 128
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# `python scripts/mining_bench.py` puts scripts/ (not the repo root) on
# sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=232_067)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--pos-k", dest="pos_k", type=int, default=32)
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--approx", action="store_true",
                   help="lax.approx_max_k instead of exact top-k")
    p.add_argument("--queries", type=int, default=0,
                   help="sweep only this many queries (0 = all N) and "
                        "extrapolate; for quick probes at huge N")
    p.add_argument("--chunk", type=int, default=0,
                   help="split the query range into host-level dispatches "
                        "of this many queries (0 = one dispatch). A "
                        "time-sliced/tunneled chip kills single dispatches "
                        "beyond ~1 min, and production pods sweep short "
                        "per-chip query shards anyway — chunking measures "
                        "the full corpus as production would run it")
    args = p.parse_args()

    from avid_cma_tpu.criterions.mining import _sweep_tiles

    rng = np.random.default_rng(0)
    def bank():
        b = jnp.asarray(rng.standard_normal((args.n, args.d)), jnp.float32)
        return b / jnp.linalg.norm(b, axis=1, keepdims=True)

    bv, ba = bank(), bank()
    nq = min(args.queries or args.n, args.n)  # clamp: queries are bank rows
    chunk = min(args.chunk or nq, nq)
    qi = jnp.arange(chunk, dtype=jnp.int32)

    sweep = jax.jit(
        lambda bv, ba, q0: _sweep_tiles(
            bv, ba,
            jax.lax.dynamic_slice_in_dim(bv, q0, chunk),
            jax.lax.dynamic_slice_in_dim(ba, q0, chunk),
            qi + q0, pos_k=args.pos_k,
            kind="consensus", tile=args.tile, exact=not args.approx,
        )
    )

    def full_pass():
        outs = []
        for q0 in range(0, nq - chunk + 1, chunk):
            outs.append(sweep(bv, ba, q0))
        for o in outs:
            np.asarray(o)  # full fetch = portable fence
        return outs

    np.asarray(sweep(bv, ba, 0))  # compile (chunks share one program)
    t0 = time.perf_counter()
    full_pass()
    dt = time.perf_counter() - t0
    swept = (nq // chunk) * chunk
    full = dt * (args.n / swept)
    flops = 2 * 2 * swept * args.n * args.d  # two N x nq x D matmuls
    # device HBM occupancy with banks + sweep live (feasibility evidence
    # for the AudioSet-2M recipes; stats absent on some backends)
    stats = jax.local_devices()[0].memory_stats() or {}
    peak_gb = stats.get("peak_bytes_in_use", 0) / 2**30
    limit_gb = stats.get("bytes_limit", 0) / 2**30
    print(json.dumps({
        "metric": "cma_mining_sweep_sec",
        "n": args.n, "d": args.d, "pos_k": args.pos_k, "tile": args.tile,
        "exact": not args.approx, "queries": swept,
        "chunk": chunk,
        "value": round(dt, 2), "unit": "s",
        "extrapolated_full_sweep_sec": round(full, 2),
        "matmul_tflops_per_sec": round(flops / dt / 1e12, 2),
        "hbm_peak_gb": round(peak_gb, 2),
        "hbm_limit_gb": round(limit_gb, 2),
    }))


if __name__ == "__main__":
    main()
