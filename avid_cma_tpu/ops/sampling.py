"""Negative/positive sampling ops, all in-graph (jit-safe).

Capability reference:
  * utils/alias_method.py:11-71 — O(1) alias-method multinomial sampling.
    The reference only ever uses it with *uniform* weights
    (criterions/avid.py:38, avid_cma.py:142), where the alias method
    degenerates to `randint`; we keep a general AliasSampler for
    non-uniform distributions and use the direct uniform path in the
    hot loop.
  * criterions/avid.py:82-86 — self-avoiding shift: draw from [0, N-1)
    then add 1 for draws >= self index.
  * criterions/avid_cma.py:196-209 — rank-shift past a *sorted* positive
    list: draw from [0, N-pos_k) and shift by the number of positives
    at-or-below the draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class AliasSampler:
    """Walker's alias method. Tables are built host-side (numpy, once);
    draws are in-graph gathers driven by `jax.random`.

    Reference behavior: utils/alias_method.py:15-71.
    """

    def __init__(self, probs: np.ndarray):
        probs = np.asarray(probs, dtype=np.float64)
        probs = probs / probs.sum()
        n = probs.shape[0]
        scaled = probs * n
        prob_table = np.zeros(n, dtype=np.float32)
        alias_table = np.zeros(n, dtype=np.int32)

        small = [i for i, p in enumerate(scaled) if p < 1.0]
        large = [i for i, p in enumerate(scaled) if p >= 1.0]
        scaled = scaled.copy()
        while small and large:
            s, l = small.pop(), large.pop()
            prob_table[s] = scaled[s]
            alias_table[s] = l
            scaled[l] = scaled[l] - (1.0 - scaled[s])
            (small if scaled[l] < 1.0 else large).append(l)
        for rest in (small, large):
            for i in rest:
                prob_table[i] = 1.0

        self.n = n
        self.prob_table = jnp.asarray(prob_table)
        self.alias_table = jnp.asarray(alias_table)

    def draw(self, key: jax.Array, shape) -> jnp.ndarray:
        k_bin, k_coin = jax.random.split(key)
        bins = jax.random.randint(k_bin, shape, 0, self.n)
        coins = jax.random.uniform(k_coin, shape)
        keep = coins < self.prob_table[bins]
        return jnp.where(keep, bins, self.alias_table[bins]).astype(jnp.int32)


def draw_negatives_uniform(
    key: jax.Array, y: jnp.ndarray, num_negatives: int, memory_size: int
) -> jnp.ndarray:
    """Uniform negatives over [0, memory_size) excluding self index `y`.

    Matches criterions/avid.py:82-86: draw from memory_size-1 choices,
    then shift draws >= y up by one.
    """
    bs = y.shape[0]
    idx = jax.random.randint(key, (bs, num_negatives), 0, memory_size - 1)
    idx = idx + (idx >= y[:, None]).astype(idx.dtype)
    return idx


def draw_negatives_avoid_sorted(
    key: jax.Array,
    pos_sorted: jnp.ndarray,
    num_negatives: int,
    memory_size: int,
) -> jnp.ndarray:
    """Uniform negatives over [0, memory_size) excluding a per-row *sorted*
    positive set `pos_sorted` (bs, pos_k).

    Matches criterions/avid_cma.py:196-209: draw from memory_size - pos_k
    choices, then shift each draw past every excluded index at or below it.
    With ref[j] = pos_sorted[j] - j, the shift is sum_j(draw >= ref[j]).

    NOTE: like the reference, this excludes the positive set but NOT the
    self index; in CMA the self instance is handled by the instance-
    discrimination heads, not the negatives.
    """
    bs, pos_k = pos_sorted.shape
    rand = jax.random.randint(key, (bs, num_negatives), 0, memory_size - pos_k)
    ref = pos_sorted - jnp.arange(pos_k, dtype=pos_sorted.dtype)[None, :]
    shift = jnp.sum(
        rand[:, :, None] >= ref[:, None, :], axis=2, dtype=rand.dtype
    )
    return rand + shift
