"""NCE loss with the reference's constant-partition-function semantics.

Capability reference: criterions/nce.py:14-58.
  * Z (the partition function) is estimated ONCE from the mean exp(score)
    of the first negative-score batch, all-reduced across replicas, then
    frozen (buffer `avg_exp_score`, init -1; freeze check nce.py:22-24).
  * loss = mean_b[ -log Pmt + sum_k -log Pon ]  (eq 5.1/5.2)

TPU-first: the one-shot stateful side effect becomes an explicit state
transition — `resolve_partition` returns the Z to use this step and the
(possibly newly frozen) Z to carry in train state. Everything is pure.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp



def resolve_partition(
    z: jnp.ndarray,
    exp_neg_scores: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Return the partition function to use this step.

    If `z > 0` it is already frozen and returned as-is. Otherwise it is
    estimated as the global mean of `exp_neg_scores` (all-reduced over
    `axis_name` when running SPMD), matching criterions/nce.py:21-36.
    The caller stores the returned value in train state (the freeze).
    """
    batch_mean = jnp.mean(exp_neg_scores)
    if axis_name is not None:
        batch_mean = jax.lax.pmean(batch_mean, axis_name)
    batch_mean = jax.lax.stop_gradient(batch_mean)
    return jnp.where(z > 0, z, batch_mean)


def nce_loss(
    scores_pos: jnp.ndarray,
    scores_neg: jnp.ndarray,
    z: jnp.ndarray,
) -> jnp.ndarray:
    """NCE loss for one head (criterions/nce.py:38-58).

    scores_pos: (bs, P) positive scores (already temperature-scaled)
    scores_neg: (bs, K) negative scores
    z: frozen partition function (scalar)
    """
    K = scores_neg.shape[1]
    log_kz = jnp.log(K * z)
    # log-space forms of the reference's eq 5.1/5.2 — exact in real
    # arithmetic and stable where the direct ratios are not: the
    # reference's -log(exp_pos/(exp_pos+KZ)) underflows/clamps for
    # strongly anti-aligned positives (exp(score/T) ~ 1e-9), losing the
    # gradient on exactly the hardest examples.
    #   -log P(origin=model) = softplus(log(KZ) - s_pos)
    #   -log P(origin=noise) = softplus(s_neg - log(KZ))
    ln_pmt = jax.nn.softplus(log_kz - scores_pos).mean(axis=-1)
    ln_pon = jax.nn.softplus(scores_neg - log_kz).sum(axis=-1)

    return (ln_pmt + ln_pon).mean()
