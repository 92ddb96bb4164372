#!/usr/bin/env python
"""HBM bandwidth microbenchmark for the local chip.

Anchors PERF.md's bandwidth-ceiling argument with measurements instead
of an inference from fusion timings: sustained GB/s for the access
patterns the train step is made of —

  copy     x -> x + c                   (1 read + 1 write / element)
  reduce   running sum over the array   (1 read / element)
  mul2     x * y -> z                   (2 reads + 1 write)
  bn-ish   (x - mean(x)) * rsqrt(var)   (stat reduce + apply: 3 ops/elem
           of traffic; what every BatchNorm in the net does)

Each at bf16 and f32, sized ~0.5 GB per operand (far beyond the v5e's
128 MB VMEM, so the measurement is HBM-bound by construction).

Measurement discipline for the tunneled runtime: per-call dispatch
latency through the tunnel is ~100 ms, so timing K separate dispatches
measures the network, not HBM. Instead each op is iterated K times
INSIDE one jit via lax.fori_loop (loop bodies execute as separate
steps — XLA does not fuse across fori_loop iterations), so one dispatch
covers K full passes over HBM; sync fetches a single scalar.

Usage: python scripts/membench.py  (runs on the default JAX platform)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, iters):
    """Best-of-3 seconds per inner iteration for jitted fn(*args)."""
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        # fence with a scalar fetch (cheap through the tunnel)
        leaf = jax.tree.leaves(out)[-1]
        np.asarray(leaf.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run(dtype, elems, iters=30):
    bytes_per = jnp.dtype(dtype).itemsize
    n_rows = elems // 1024
    x = jnp.ones((n_rows, 1024), dtype)
    y = jnp.full((n_rows, 1024), 2, dtype)
    res = {}

    @jax.jit
    def copy(a):
        # data-dependent chain: each iteration reads + writes the array
        return jax.lax.fori_loop(0, iters, lambda i, b: b + 1, a)

    res["copy"] = 2 * elems * bytes_per / _timed(copy, x, iters=iters) / 1e9

    @jax.jit
    def reduce(a):
        return jax.lax.fori_loop(
            0, iters, lambda i, s: s + (a + i.astype(a.dtype)).sum(),
            jnp.zeros((), a.dtype))

    res["reduce"] = elems * bytes_per / _timed(reduce, x, iters=iters) / 1e9

    @jax.jit
    def mul2(a, b):
        return jax.lax.fori_loop(0, iters, lambda i, c: c * b, a)

    res["mul2"] = 3 * elems * bytes_per / _timed(mul2, x, y, iters=iters) / 1e9

    @jax.jit
    def bnish(a):
        def body(i, b):
            m = b.mean(axis=0, keepdims=True)
            v = ((b - m) ** 2).mean(axis=0, keepdims=True)
            return (b - m) * jax.lax.rsqrt(v + 1e-5)
        return jax.lax.fori_loop(0, iters, body, a)

    res["bn2pass"] = 3 * elems * bytes_per / _timed(bnish, x, iters=iters) / 1e9
    return {k: round(v, 1) for k, v in res.items()}


def main():
    elems = 256 * 1024 * 1024  # 512 MB bf16 / 1 GB f32 per operand
    out = {
        "device": jax.devices()[0].device_kind,
        "bf16_GBps": run(jnp.bfloat16, elems),
        "f32_GBps": run(jnp.float32, elems // 2),
    }
    best = max(max(out["bf16_GBps"].values()), max(out["f32_GBps"].values()))
    out["best_GBps"] = best
    print(json.dumps(out))


if __name__ == "__main__":
    main()
