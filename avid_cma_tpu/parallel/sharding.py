"""Row-sharded memory-bank operations (SPMD, inside shard_map).

Scaling rationale (SURVEY §2.3/§5): the reference replicates both banks
per GPU (AudioSet-2M: ~1.8 GB, criterions/avid.py:88-101); beyond-HBM
corpora need the rows sharded over the mesh. This module provides the
three bank primitives in sharded form:

  * gather_rows_sharded   — rows by global index: each device contributes
    the rows it owns (masked local gather), combined with one psum over
    the mesh axis. Cost: one (bs*K, D) psum riding ICI.
  * update_rows_sharded   — EMA+renorm scatter: every device computes the
    same updated rows from the all_gathered batch, then scatters only the
    rows it owns (out-of-range local indices dropped).
  * shard/unshard helpers for moving a BankState between layouts.

All functions assume bank_local = bank[offset : offset + n_local] with
n_local = ceil(N / n_devices) (zero-padded tail on the last device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def padded_rows(n: int, n_devices: int) -> int:
    return -(-n // n_devices) * n_devices


def shard_bank(bank: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jax.Array:
    """(N, D) replicated -> row-sharded global array (padded to the mesh)."""
    n_dev = mesh.shape[axis]
    pad = padded_rows(bank.shape[0], n_dev) - bank.shape[0]
    if pad:
        bank = jnp.pad(bank, ((0, pad), (0, 0)))
    return jax.device_put(bank, NamedSharding(mesh, P(axis, None)))


def unshard_bank(bank: jax.Array, n: int) -> jnp.ndarray:
    return jnp.asarray(bank)[:n]


def local_offset(n_local: int, axis: str) -> jnp.ndarray:
    return jax.lax.axis_index(axis) * n_local


def gather_rows_sharded(
    bank_local: jnp.ndarray, idx: jnp.ndarray, axis: str
) -> jnp.ndarray:
    """bank[idx] with bank row-sharded. idx: any int shape; returns
    idx.shape + (D,). One psum over `axis`."""
    n_local = bank_local.shape[0]
    local = idx - local_offset(n_local, axis)
    valid = (local >= 0) & (local < n_local)
    rows = jnp.where(
        valid[..., None],
        bank_local[jnp.clip(local, 0, n_local - 1)],
        jnp.zeros((), bank_local.dtype),
    )
    return jax.lax.psum(rows, axis)


def gather_values_sharded(
    table_local: jnp.ndarray, idx: jnp.ndarray, axis: str
) -> jnp.ndarray:
    """Like gather_rows_sharded but for int/other 2-D tables (e.g. the CMA
    positive_set (N, pos_k))."""
    return gather_rows_sharded(table_local, idx, axis)


def update_rows_sharded(
    bank_local: jnp.ndarray,
    y: jnp.ndarray,
    new_rows: jnp.ndarray,
    axis: str,
) -> jnp.ndarray:
    """bank[y] = new_rows with bank row-sharded; y/new_rows are the
    (globally identical) all_gathered batch. OOB local indices drop."""
    n_local = bank_local.shape[0]
    local = y - local_offset(n_local, axis)
    return bank_local.at[local].set(
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
    EMA toward `emb`, renorm, scatter back."""
    old = gather_rows_sharded(bank_local, y, axis)
    new = old * momentum + emb * (1.0 - momentum)
    new = new / jnp.maximum(jnp.linalg.norm(new, axis=-1, keepdims=True), eps)
    return update_rows_sharded(bank_local, y, new, axis)
