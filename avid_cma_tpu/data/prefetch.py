"""Device prefetch: overlap host->device transfer with device compute.

The reference overlaps H2D with compute via pinned-memory
`.cuda(non_blocking=True)` plus DataLoader worker processes
(main-avid.py:161-163). The JAX equivalent is explicit: `jax.device_put`
is asynchronous (it enqueues the DMA and returns a future-backed Array),
so placing the NEXT batch on the mesh while the device executes the
current step hides the transfer entirely as long as the host can keep
up. Without this, jit's implicit placement of a numpy batch runs the H2D
copy synchronously inside the dispatch, serializing transfer after
compute every step.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterable, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avid_cma_tpu.parallel.mesh import DATA_AXIS
from avid_cma_tpu.parallel.multihost import global_batch, is_multiprocess


def place_batch(
    batch: Dict[str, Any], mesh: Mesh, axis: str = DATA_AXIS
) -> Dict[str, Any]:
    """One host batch (this process's rows) -> device arrays row-sharded
    over `axis` (scalars replicated). Asynchronous: returns as soon as
    the transfers are enqueued. Multi-process placement routes through
    the multihost bridge (global arrays)."""
    if is_multiprocess():
        return global_batch(batch, mesh, axis)

    def one(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: one(v) for k, v in batch.items()}


def device_prefetch(
    batches: Iterable[Dict[str, Any]],
    mesh: Mesh,
    axis: str = DATA_AXIS,
    depth: int = 2,
) -> Iterator[Dict[str, Any]]:
    """Iterate `batches`, keeping up to `depth` of them placed on the
    mesh ahead of the consumer (double-buffering at depth=2: batch i+1's
    H2D DMA runs while the device executes step i).

    Yields exactly the batches of the underlying iterator, in order, as
    device (or global, under multi-process) arrays ready to pass straight
    to the fused step — callers must NOT re-wrap them in global_batch.
    """
    if depth < 1:
        raise ValueError(f"prefetch depth must be >= 1, got {depth}")
    it = iter(batches)
    buf: collections.deque = collections.deque()
    try:
        while len(buf) < depth:
            buf.append(place_batch(next(it), mesh, axis))
    except StopIteration:
        it = None
    while buf:
        out = buf.popleft()
        if it is not None:
            try:
                buf.append(place_batch(next(it), mesh, axis))
            except StopIteration:
                it = None
        yield out
