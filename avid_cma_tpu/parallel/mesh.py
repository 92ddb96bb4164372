"""Device-mesh helpers.

The reference's distributed substrate is NCCL process groups — 1 process
per GPU, TCP rendezvous (reference: utils/main_utils.py:18-31,
main-avid.py:29-45). TPU-native replacement: a single process per host
addressing all local devices through a `jax.sharding.Mesh`;
`jax.distributed.initialize()` for multi-host (no rendezvous URL surface).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D (default) or reshaped mesh over the available devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) if len(axis_names) == 1 else None
    if shape is None:
        raise NotImplementedError("multi-axis meshes: pass devices pre-shaped")
    return Mesh(np.asarray(devs).reshape(shape), tuple(axis_names))


def initialize_multihost(required: bool = False) -> None:
    """Multi-host init (reference analogue: utils/main_utils.py:18-31).
    Safe to call on single-host setups where the TPU runtime provides
    coordination; no-ops when not in a multi-host environment.

    `required=True` (an explicitly requested multi-host run, e.g. the
    --multihost CLI flag): failures RAISE — silently degrading to N
    independent single-process runs would train N wrong replicas that
    clobber each other's checkpoints."""
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError) as e:
        if required:
            raise RuntimeError(
                "multi-host initialization failed for an explicitly "
                f"requested multi-host run: {e}"
            ) from e
        # auto-detection path: not a multi-host environment


def process_batch_slice(global_batch: int) -> int:
    """Per-process share of the global batch (reference divides the config
    batch size per GPU process, utils/main_utils.py:128-133)."""
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(
            f"global batch {global_batch} not divisible by {count} processes"
        )
    return global_batch // count
