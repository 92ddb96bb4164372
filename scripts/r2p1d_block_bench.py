#!/usr/bin/env python
"""A/B the fused (2+1)D conv-pair Pallas kernel vs XLA's two-pass pair.

SURVEY §7.8's one unattempted kernel (VERDICT r3 weak #4): measure, at
the conv2x hot shape (B=32, T=8, 56^2, C=64, bf16 — 42% of the train
step per PERF.md's profile), whether holding the intermediate in VMEM
beats XLA's write-I/read-I pipeline. K separate timed iterations run
inside ONE jitted fori_loop (dispatch latency through the tunnel is
~100 ms — the scripts/membench.py lesson). Prints one JSON line;
interpretation goes to PERF.md.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_loop(fn, args, iters):
    """Device seconds per call: fn chained `iters` times inside one jit
    (output fed back as input so iterations cannot be CSE'd away)."""

    @jax.jit
    def run(x, *rest):
        def body(_, carry):
            out = fn(carry, *rest)
            # feed a slice of the output back into the input so the loop
            # carries a data dependency (same shape: pair is shape-
            # preserving)
            return out
        return jax.lax.fori_loop(0, iters, body, x)

    out = run(*args)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    out = run(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=56)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from avid_cma_tpu.ops.pallas.r2p1d_block import (
        r2p1d_pair_pallas,
        r2p1d_pair_xla,
    )

    B, T, H, C = args.batch, args.frames, args.size, args.channels
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, H, C)) * 0.5, dtype)
    ws = jnp.asarray(rng.normal(size=(1, 3, 3, C, C)) * 0.05, dtype)
    wt = jnp.asarray(rng.normal(size=(3, 1, 1, C, C)) * 0.05, dtype)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    bias = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)

    # correctness first
    a = np.asarray(r2p1d_pair_pallas(x, ws, wt, scale, bias), np.float32)
    b = np.asarray(r2p1d_pair_xla(x, ws, wt, scale, bias), np.float32)
    err = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))
    assert err < 2e-2, f"pallas vs xla mismatch: rel {err}"

    t_pallas = timed_loop(
        lambda x_, ws_, wt_, s_, b_: r2p1d_pair_pallas(x_, ws_, wt_, s_, b_),
        (x, ws, wt, scale, bias), args.iters,
    )
    t_xla = timed_loop(
        lambda x_, ws_, wt_, s_, b_: r2p1d_pair_xla(x_, ws_, wt_, s_, b_),
        (x, ws, wt, scale, bias), args.iters,
    )
    bytes_io = x.size * x.dtype.itemsize * 2  # in + out, ignoring weights
    inter = x.size * 2  # the bf16 intermediate XLA writes+reads
    print(json.dumps({
        "metric": "r2p1d_fused_pair_ms",
        "shape": [B, T, H, H, C], "dtype": args.dtype,
        "pallas_ms": round(t_pallas * 1e3, 3),
        "xla_ms": round(t_xla * 1e3, 3),
        "speedup": round(t_xla / t_pallas, 3),
        "rel_err": round(err, 6),
        "io_bytes_mb": round(bytes_io / 2**20, 1),
        "xla_extra_intermediate_mb": round(2 * inter / 2**20, 1),
    }))


if __name__ == "__main__":
    main()
