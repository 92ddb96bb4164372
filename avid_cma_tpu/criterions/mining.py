"""CMA positive-set mining: blocked agreement top-k sweep over the banks.

Capability reference: criterions/avid_cma.py:24-123 (CMASampler). The
reference fans 16-query jobs out to one CUDA worker process per GPU
through mp.Queues, computes `mm(bank, bank[q].T)` per modality, takes a
min/max agreement, top-(k+1), drops self, sorts.

TPU-first redesign: no processes, no queues — one jitted SPMD sweep.
Queries (== bank rows) are sharded over the mesh `data` axis; each device
scans its local queries in MXU-sized tiles against the (replicated) banks:

    sim_v = bank_v @ q_v.T       (N, Q)  — one big matmul per modality
    agree = min/max(sim_v, sim_a)        — fused elementwise
    top_k over N with the self column masked to -inf (exact self removal,
    instead of the reference's drop-the-top-1 heuristic which can drop a
    non-self tie), then indices sorted ascending (negative rank-shift
    sampling requires sorted positive lists, avid_cma.py:70).

Wall-clock is O(N^2 D / devices) of pure MXU work; tile size trades VMEM/HBM
footprint for matmul size.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AGREEMENT_TYPES = ("consensus", "union", "video", "audio")


def _agreement(sim_v: jnp.ndarray, sim_a: jnp.ndarray, kind: str) -> jnp.ndarray:
    # reference: criterions/avid_cma.py:56-65
    if kind == "consensus":
        return jnp.minimum(sim_v, sim_a)
    if kind == "union":
        return jnp.maximum(sim_v, sim_a)
    if kind == "video":
        return sim_v
    if kind == "audio":
        return sim_a
    raise ValueError(f"unknown agreement type {kind!r}; one of {AGREEMENT_TYPES}")


def _sweep_tiles(
    bank_v: jnp.ndarray,
    bank_a: jnp.ndarray,
    q_v: jnp.ndarray,
    q_a: jnp.ndarray,
    q_index: jnp.ndarray,
    pos_k: int,
    kind: str,
    tile: int,
    exact: bool = True,
    n_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Top-k agreement indices for local queries (num_q, D) against full
    banks (N, D). Returns (num_q, pos_k) int32, rows sorted ascending.

    exact=False uses lax.approx_max_k (TPU PartialReduce; measured
    recall 0.995 at the 0.99 target) — mined positive sets are
    themselves a heuristic (reference criterions/avid_cma.py:56-70), so
    sub-1% recall loss is an acceptable trade at AudioSet scale, where
    the measured full-corpus sweep at N=1,784,108 is 74 s approx vs
    430 s exact on one chip (PERF.md); the default stays exact for
    reference parity."""
    num_q = q_v.shape[0]
    n_tiles = -(-num_q // tile)
    pad = n_tiles * tile - num_q
    q_v = jnp.pad(q_v, ((0, pad), (0, 0)))
    q_a = jnp.pad(q_a, ((0, pad), (0, 0)))
    # padded queries get self-index -1: masks nothing, results discarded
    q_index = jnp.pad(q_index, (0, pad), constant_values=-1)

    q_v = q_v.reshape(n_tiles, tile, -1)
    q_a = q_a.reshape(n_tiles, tile, -1)
    q_index = q_index.reshape(n_tiles, tile)

    def one_tile(carry, inp):
        qv, qa, qi = inp
        # HIGHEST precision: near-ties in the agreement decide set membership,
        # and the reference computes exact-f32 similarities (avid_cma.py:52-53).
        sim_v = jnp.dot(
            qv, bank_v.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sim_a = jnp.dot(
            qa, bank_a.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        agree = _agreement(sim_v, sim_a, kind)  # (tile, N)
        col = jax.lax.broadcasted_iota(jnp.int32, agree.shape, 1)
        agree = jnp.where(col == qi[:, None], -jnp.inf, agree)
        if n_valid is not None:
            # zero-padded bank rows (row-sharded layouts pad N up to a
            # mesh multiple) score agreement 0, which would beat real
            # negative similarities — mask them out of the top-k
            agree = jnp.where(col >= n_valid, -jnp.inf, agree)
        if exact:
            _, idx = jax.lax.top_k(agree, pos_k)
        else:
            _, idx = jax.lax.approx_max_k(agree, pos_k, recall_target=0.99)
        return carry, jnp.sort(idx, axis=1).astype(jnp.int32)

    _, out = jax.lax.scan(one_tile, None, (q_v, q_a, q_index))
    return out.reshape(n_tiles * tile, pos_k)[:num_q]


@partial(jax.jit, static_argnames=("pos_k", "kind", "tile", "exact"))
def _mine_local(bank_v, bank_a, pos_k, kind, tile, exact=True):
    n = bank_v.shape[0]
    q_index = jnp.arange(n, dtype=jnp.int32)
    return _sweep_tiles(bank_v, bank_a, bank_v, bank_a, q_index, pos_k, kind,
                        tile, exact)


# jitted-callable caches: re-mining happens every resample_freq epochs
# (train/loop.py), and jit keyed on a per-call closure would re-lower and
# re-compile the O(N^2 D) sweep program on every resample
@lru_cache(maxsize=8)
def _mine_mesh_fn(mesh, axis, n, pad, pos_k, kind, tile, exact):
    sweep = partial(_sweep_tiles, pos_k=pos_k, kind=kind, tile=tile,
                    exact=exact)

    def body(bv, ba):
        q_index = jnp.pad(
            jnp.arange(n, dtype=jnp.int32), (0, pad), constant_values=-1
        )
        q_v = jnp.pad(bv, ((0, pad), (0, 0)))
        q_a = jnp.pad(ba, ((0, pad), (0, 0)))
        mined = jax.shard_map(
            lambda bv2, ba2, qv, qa, qi: sweep(bv2, ba2, qv, qa, qi[0]),
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(None, axis)),
            out_specs=P(axis),
        )(bv, ba, q_v, q_a, q_index[None])
        return mined[:n]

    return jax.jit(body, out_shardings=NamedSharding(mesh, P()))


@lru_cache(maxsize=8)
def _mine_sharded_fn(mesh, axis, n, n_local, pos_k, kind, tile, exact):
    sweep = partial(_sweep_tiles, pos_k=pos_k, kind=kind, tile=tile,
                    exact=exact, n_valid=n)

    def local(bv_loc, ba_loc):
        bv = jax.lax.all_gather(bv_loc, axis, tiled=True)  # (Npad, D)
        ba = jax.lax.all_gather(ba_loc, axis, tiled=True)
        offset = jax.lax.axis_index(axis) * n_local
        qi = offset + jnp.arange(n_local, dtype=jnp.int32)
        qi = jnp.where(qi < n, qi, -1)  # padded queries: discard rows
        return sweep(bv, ba, bv_loc, ba_loc, qi)

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(axis, None),
        )
    )


def mine_positives(
    bank_v: jnp.ndarray,
    bank_a: jnp.ndarray,
    pos_k: int,
    kind: str = "consensus",
    tile: int = 256,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    exact: bool = True,
) -> jnp.ndarray:
    """Mine the (N, pos_k) positive set from replicated (N, D) banks.
    With a mesh, queries are sharded over `axis` (each device sweeps
    N/devices queries against the full banks); without one, a
    single-device blocked sweep. exact=False switches the per-tile top-k
    to lax.approx_max_k (see _sweep_tiles); config surface:
    loss.args.sampling_args.exact.

    All padding/trimming happens INSIDE the jit so the banks may be
    multi-process global arrays (eager ops on those are illegal); the
    result comes back fully replicated over the mesh."""
    if mesh is None or mesh.size == 1:
        return _mine_local(bank_v, bank_a, pos_k, kind, tile, exact)

    n, _ = bank_v.shape
    n_dev = mesh.shape[axis]
    pad = (-n) % n_dev
    fn = _mine_mesh_fn(mesh, axis, n, pad, pos_k, kind, tile, exact)
    return fn(bank_v, bank_a)


def mine_positives_sharded(
    bank_v: jax.Array,
    bank_a: jax.Array,
    n: int,
    pos_k: int,
    kind: str = "consensus",
    tile: int = 256,
    *,
    mesh: Mesh,
    axis: str = "data",
    exact: bool = True,
) -> jax.Array:
    """Mine directly from ROW-SHARDED banks — (Npad, D) global arrays laid
    out by parallel/sharding.shard_bank — returning the positive set in
    the SAME padded row-sharded layout (what a sharded-bank TrainState
    stores). No host round-trip, so it works under multi-process
    execution where eager unshard/reshard of global arrays is illegal.

    Each device's queries are the rows it already owns; the full banks
    are assembled per device with one all_gather (transient ~N*D*4 bytes
    — the persistent replication the reference pays for training,
    criterions/avid.py:88-101, is paid here only for the sweep's
    duration). Zero-padded tail rows are masked out of every top-k
    (n_valid), and padded query rows produce discarded garbage."""
    npad = bank_v.shape[0]
    n_dev = mesh.shape[axis]
    n_local = npad // n_dev
    fn = _mine_sharded_fn(mesh, axis, n, n_local, pos_k, kind, tile, exact)
    return fn(bank_v, bank_a)
