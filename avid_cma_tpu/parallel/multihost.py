"""Multi-host (multi-process) execution: the host-local -> global bridge.

Capability reference: multi-node data-parallel training
(main-avid.py:66-78 CLI + utils/main_utils.py:18-31 NCCL process-group
init + DistributedSampler per-process sharding, README.md:53-60).

TPU-native redesign: one process per host addressing a single GLOBAL
`jax.sharding.Mesh` over every process's devices. Each process's loader
yields only its shard of the global batch (data/loader.py
ShardedBatchSampler); `global_batch` assembles those host-local numpy
rows into global `jax.Array`s whose data-axis shards live on the local
devices (`jax.make_array_from_process_local_data`) — the piece torch DDP
gets implicitly from per-process model replicas. Train state built
identically on every process is placed once with `distribute_tree`; from
there the jitted SPMD step runs unchanged and its collectives (grad
psum, bank all_gathers) ride ICI/DCN exactly as single-host.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avid_cma_tpu.parallel.mesh import DATA_AXIS


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_batch(
    batch: Dict[str, Any], mesh: Mesh, axis: str = DATA_AXIS
) -> Dict[str, Any]:
    """Per-process loader batch (host numpy; rows are THIS process's
    shard of the global batch) -> global arrays row-sharded over `axis`.

    Single-process this is the identity: jit consumes numpy directly and
    shards it on dispatch, so the extra device_put would only add a copy.
    Multi-process, every process must call this with its own shard (the
    assembly is collective in spirit: global row order is process-major,
    matching ShardedBatchSampler's shard enumeration)."""
    if not is_multiprocess():
        return batch

    def one(x):
        x = np.asarray(x)
        # scalars can't be row-sharded — replicate (local value must be
        # process-identical, which scalar batch fields are by contract)
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        kw = {} if x.ndim else {"global_shape": x.shape}
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x, **kw
        )

    return {k: one(v) for k, v in batch.items()}


def _is_prng_key(x) -> bool:
    return isinstance(x, jax.Array) and jnp.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _place(x, sharding: NamedSharding):
    """One host-resident leaf (identical on every process) -> a global
    array with `sharding`. Single-process: plain device_put."""
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    # global_shape == local shape tells JAX the full array is present on
    # every process; each slices out its addressable portion
    return jax.make_array_from_process_local_data(
        sharding, x, global_shape=x.shape
    )


def distribute_tree(tree, mesh: Mesh, specs=None):
    """Process-identical host-built pytree (a fresh TrainState, an
    imported checkpoint, ...) -> global arrays over `mesh` with per-leaf
    PartitionSpecs (default: fully replicated). Works single-process too
    (plain sharded placement), so callers need no branching.

    PRNG-key leaves route through key_data/wrap_key_data — numpy cannot
    hold typed keys, and eager ops on multi-process arrays are illegal,
    so the re-wrap happens inside a jit."""
    if specs is None:
        specs = jax.tree.map(lambda _: P(), tree)

    def one(x, spec):
        if x is None:  # empty pytree slots (is_leaf routes them here)
            return None
        sharding = NamedSharding(mesh, spec if spec is not None else P())
        if _is_prng_key(x):
            if not is_multiprocess():
                return jax.device_put(x, sharding)
            data = _place(np.asarray(jax.random.key_data(x)), sharding)
            return jax.jit(
                jax.random.wrap_key_data, out_shardings=sharding
            )(data)
        return _place(x, sharding)

    return jax.tree.map(
        one, tree, specs,
        is_leaf=lambda x: x is None,
    )


def process_local_slice(arr: jax.Array) -> np.ndarray:
    """Host copy of this process's rows of a data-sharded global array
    (inverse of `global_batch` for one output). Fully-replicated arrays
    return the whole value."""
    if (not is_multiprocess() or arr.is_fully_addressable
            or arr.is_fully_replicated):
        return np.asarray(arr)
    # dedupe by shard offset: partially-replicated layouts repeat the
    # same rows on several local devices, and concatenating every
    # addressable shard would duplicate them
    by_offset = {}
    for s in arr.addressable_shards:
        off = tuple(sl.start or 0 for sl in s.index)
        by_offset.setdefault(off, s)
    shards = [by_offset[off] for off in sorted(by_offset)]
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def sync_float(value: float, reduce: str = "mean") -> float:
    """Cross-process scalar reduction for host-side metrics (reference:
    cross-GPU meter sync, utils/logger.py:73-79). No-op single-process."""
    if not is_multiprocess():
        return float(value)
    from jax.experimental import multihost_utils

    # double-single transport: process_allgather canonicalizes f64 -> f32
    # (x64 mode is off), so ship (hi, lo = value - hi) f32 pairs and
    # reassemble in f64 on the host
    v = float(value)
    hi = np.float32(v)
    lo = np.float32(v - float(hi))
    pair = multihost_utils.process_allgather(np.asarray([hi, lo], np.float32))
    pair = np.asarray(pair, np.float64).reshape(-1, 2)
    vals = pair[:, 0] + pair[:, 1]
    if reduce == "mean":
        return float(vals.mean())
    if reduce == "sum":
        return float(vals.sum())
    raise ValueError(f"unknown reduce '{reduce}'")


def sync_any(flag: bool) -> bool:
    """True if the flag is set on ANY process (lockstep pump control for
    loops where every process must keep dispatching until all are done).
    No-op single-process."""
    if not is_multiprocess():
        return bool(flag)
    return sync_float(float(bool(flag)), reduce="sum") > 0


def sync_counts(counts: np.ndarray) -> np.ndarray:
    """Cross-process SUM of an integer/float count vector (eval metric
    accumulators: correct@k / totals). No-op single-process."""
    counts = np.asarray(counts)
    if not is_multiprocess():
        return counts
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(counts)).sum(axis=0)
