"""Row-sharded memory-bank operations (SPMD, inside shard_map).

Scaling rationale (SURVEY §2.3/§5): the reference replicates both banks
per GPU (AudioSet-2M: ~1.8 GB, criterions/avid.py:88-101); beyond-HBM
corpora need the rows sharded over the mesh. This module provides the
three bank primitives in sharded form:

  * gather_rows_sharded   — rows by global index: each device contributes
    the rows it owns (masked local gather), combined over the mesh axis
    with one reduce-scatter (replicated indices: one psum). Cost: one
    (bs*K, D) collective riding ICI.
  * update_rows_sharded   — EMA+renorm scatter: every device computes the
    same updated rows from the all_gathered batch, then scatters only the
    rows it owns (out-of-range local indices dropped).
  * shard/unshard helpers for moving a BankState between layouts.

All functions assume bank_local = bank[offset : offset + n_local] with
n_local = ceil(N / n_devices) (zero-padded tail on the last device).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def padded_rows(n: int, n_devices: int) -> int:
    return -(-n // n_devices) * n_devices


def pad_bank_rows(bank: jnp.ndarray, n_devices: int) -> jnp.ndarray:
    """Zero-pad the row axis up to a device multiple (host-side; the
    sharded row layout needs equal per-device counts)."""
    pad = padded_rows(bank.shape[0], n_devices) - bank.shape[0]
    if pad:
        widths = ((0, pad),) + ((0, 0),) * (bank.ndim - 1)
        bank = jnp.pad(bank, widths)
    return bank


def shard_bank(bank: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jax.Array:
    """(N, ...) host/replicated -> row-sharded global array (padded to the
    mesh). Single-process placement; multi-process callers go through
    parallel/multihost.distribute_tree instead."""
    bank = pad_bank_rows(bank, mesh.shape[axis])
    spec = P(axis, *([None] * (bank.ndim - 1)))
    return jax.device_put(bank, NamedSharding(mesh, spec))


def unshard_bank(bank: jax.Array, n: int,
                 mesh: Optional[Mesh] = None) -> jnp.ndarray:
    """Row-sharded (padded) -> unpadded replicated view. Multi-process
    callers must pass `mesh`: eager ops on multi-process global arrays
    are illegal, so the gather+trim runs inside a jit."""
    if mesh is not None and jax.process_count() > 1:
        return jax.jit(
            lambda b: b[:n], out_shardings=NamedSharding(mesh, P())
        )(bank)
    return jnp.asarray(bank)[:n]


def local_offset(n_local: int, axis: str) -> jnp.ndarray:
    return jax.lax.axis_index(axis) * n_local


def _masked_local_rows(
    bank_local: jnp.ndarray, idx: jnp.ndarray, axis: str
) -> jnp.ndarray:
    """Rows this shard owns for global indices `idx` (0 elsewhere)."""
    n_local = bank_local.shape[0]
    local = idx - local_offset(n_local, axis)
    valid = (local >= 0) & (local < n_local)
    return jnp.where(
        valid[..., None],
        bank_local[jnp.clip(local, 0, n_local - 1)],
        jnp.zeros((), bank_local.dtype),
    )


def gather_rows_sharded(
    bank_local: jnp.ndarray,
    idx: jnp.ndarray,
    axis: str,
    replicated_idx: bool = False,
) -> jnp.ndarray:
    """bank[idx] with bank row-sharded. idx: any int shape of GLOBAL row
    ids; returns idx.shape + (D,).

    `replicated_idx=True` is the cheap path (one idx.shape+(D,) psum) and is
    ONLY correct when every replica passes the same `idx` — a psum of
    per-shard masked gathers mixes the replicas' requests otherwise. For
    per-replica indices (the common case: each replica's own batch rows /
    negative draws) the indices are first all_gathered so every shard can
    serve every replica's request, and each replica slices its own slot
    after the psum."""
    if replicated_idx:
        return jax.lax.psum(_masked_local_rows(bank_local, idx, axis), axis)
    idx_g = jax.lax.all_gather(idx, axis)  # (n_dev,) + idx.shape
    rows = _masked_local_rows(bank_local, idx_g, axis)
    # psum_scatter, not psum+[axis_index]: each replica only keeps its own
    # slot, so reduce-scatter moves 1/n_dev the bytes of a full all-reduce
    return jax.lax.psum_scatter(rows, axis, scatter_dimension=0, tiled=False)


def gather_values_sharded(
    table_local: jnp.ndarray,
    idx: jnp.ndarray,
    axis: str,
    replicated_idx: bool = False,
) -> jnp.ndarray:
    """Like gather_rows_sharded but for int/other 2-D tables (e.g. the CMA
    positive_set (N, pos_k))."""
    return gather_rows_sharded(table_local, idx, axis, replicated_idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def scores_sharded(
    bank_local: jnp.ndarray,
    idx: jnp.ndarray,
    query: jnp.ndarray,
    axis: str,
) -> jnp.ndarray:
    """query · bank[idx] with the bank row-sharded and idx/query
    PER-REPLICA. idx: (bs, K) global row ids; query: (bs, D); returns
    (bs, K) scores.

    This fuses the gather into the score einsum so the collective moves
    (n_dev·bs·K) score scalars instead of (n_dev·bs·K·D) row elements —
    the D× cheaper way to run NCE scoring against a sharded bank (the
    memory-axis analogue of ring attention's score-not-KV exchange).
    Differentiable in `query` via a custom VJP whose backward is the same
    masked-contribution psum at (n_dev·bs·D) cost; the bank is a constant
    (callers stop_gradient it — matches the reference, where bank rows
    are buffers, criterions/avid.py:88-101)."""
    s, _ = _scores_sharded_fwd(bank_local, idx, query, axis)
    return s


def _scores_sharded_fwd(bank_local, idx, query, axis):
    idx_g = jax.lax.all_gather(idx, axis)  # (n_dev, bs, K)
    q_g = jax.lax.all_gather(query, axis)  # (n_dev, bs, D)
    rows = _masked_local_rows(bank_local, idx_g, axis)  # (n_dev, bs, K, D)
    # reduce-scatter: each replica keeps only its own (bs, K) score slot
    s_own = jax.lax.psum_scatter(
        jnp.einsum("nbkd,nbd->nbk", rows, q_g), axis,
        scatter_dimension=0, tiled=False,
    )
    # query[:0]: zero-size carrier of the primal query dtype — the
    # backward's cotangent must come back in the PRIMAL's dtype (a bf16
    # model with an f32 bank would otherwise get an f32 dq that silently
    # promotes the whole backbone backward; same invariant as
    # ops/pallas/nce_gather.py's VJP)
    return s_own, (bank_local, idx, query[:0])


def _scores_sharded_bwd(axis, res, ds):
    bank_local, idx, q_proto = res
    # dq[b, :] = sum_k ds[b, k] * bank[idx[b, k]], assembled shard-wise:
    # every shard weights the rows it owns by the (all_gathered) upstream
    # cotangent, one (n_dev, bs, D) psum combines, each replica keeps its
    # own slot.
    idx_g = jax.lax.all_gather(idx, axis)  # (n_dev, bs, K)
    ds_g = jax.lax.all_gather(ds, axis)  # (n_dev, bs, K)
    rows = _masked_local_rows(bank_local, idx_g, axis)  # (n_dev, bs, K, D)
    dq = jax.lax.psum_scatter(
        jnp.einsum("nbkd,nbk->nbd", rows, ds_g), axis,
        scatter_dimension=0, tiled=False,
    )
    return jnp.zeros_like(bank_local), None, dq.astype(q_proto.dtype)


scores_sharded.defvjp(_scores_sharded_fwd, _scores_sharded_bwd)


def update_rows_sharded(
    bank_local: jnp.ndarray,
    y: jnp.ndarray,
    new_rows: jnp.ndarray,
    axis: str,
) -> jnp.ndarray:
    """bank[y] = new_rows with bank row-sharded; y/new_rows are the
    (globally identical) all_gathered batch. Rows not owned by this shard
    are dropped. NOTE: negative indices under mode="drop" wrap Python-style
    rather than dropping, so not-owned indices are remapped to the
    explicitly out-of-bounds value n_local before the scatter."""
    n_local = bank_local.shape[0]
    local = y - local_offset(n_local, axis)
    owned = (local >= 0) & (local < n_local)
    safe = jnp.where(owned, local, n_local)
    return bank_local.at[safe].set(
        new_rows.astype(bank_local.dtype), mode="drop"
    )


def ema_update_rows_sharded(
    bank_local: jnp.ndarray,
    y: jnp.ndarray,
    emb: jnp.ndarray,
    momentum: float,
    axis: str,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Sharded equivalent of criterions/avid.py:103-129: gather old rows,
    EMA toward `emb`, renorm, scatter back. `y`/`emb` are the all_gathered
    (replica-identical) batch, so the cheap replicated-idx gather applies."""
    old = gather_rows_sharded(bank_local, y, axis, replicated_idx=True)
    new = old * momentum + emb * (1.0 - momentum)
    new = new / jnp.maximum(jnp.linalg.norm(new, axis=-1, keepdims=True), eps)
    return update_rows_sharded(bank_local, y, new, axis)
