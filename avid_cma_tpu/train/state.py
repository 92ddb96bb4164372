"""Train state: one pytree carrying everything a step transitions.

The reference scatters this across mutable module buffers (banks inside
the criterion, BN stats inside the model, optimizer state in torch.optim;
checkpoint dict utils/main_utils.py:271-287). Here it is a single
immutable pytree: `state' = train_step(state, batch)` — donate-able, so
XLA updates the banks in place in HBM.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from avid_cma_tpu.criterions.avid import BankState


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    epoch: jnp.ndarray  # int32 scalar (for logging/schedules only)
    params: Any
    batch_stats: Any
    opt_state: Any
    bank: Optional[BankState]  # BankState | CMAState | None (eval)
    rng: jax.Array

    def next_rng(self) -> jax.Array:
        """Deterministic per-step key (replica-invariant; fold the mesh
        axis index on top inside SPMD code when per-replica keys are
        needed)."""
        return jax.random.fold_in(self.rng, self.step)

    def with_epoch(self, epoch: int) -> "TrainState":
        """Set the epoch counter by deriving it ON DEVICE from the
        existing scalar (`epoch * 0 + n`). A fresh host-created
        jnp.int32 would carry a different layout/commit key than the
        step executable's outputs and force a full recompile of the
        donated jitted step at every epoch boundary (~40 s each).
        Runs under jit (one compile total: `epoch` is traced) because
        eager ops on multi-process global arrays are illegal."""
        return self.replace(epoch=_bump_epoch(self.epoch, epoch))


@jax.jit
def _bump_epoch(e: jnp.ndarray, n) -> jnp.ndarray:
    return e * 0 + jnp.asarray(n, e.dtype)
