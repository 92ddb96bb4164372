"""Sampling-op invariants (reference: utils/alias_method.py,
criterions/avid.py:82-86, criterions/avid_cma.py:196-209)."""

import jax
import jax.numpy as jnp
import numpy as np

from avid_cma_tpu.ops.sampling import (
    AliasSampler,
    draw_negatives_avoid_sorted,
    draw_negatives_uniform,
)


def test_uniform_negatives_avoid_self_and_in_range():
    N, K = 50, 2000
    y = jnp.asarray([0, 7, 25, 49])
    idx = np.asarray(draw_negatives_uniform(jax.random.key(0), y, K, N))
    assert idx.min() >= 0 and idx.max() < N
    for row, self_idx in zip(idx, np.asarray(y)):
        assert self_idx not in row
        # all other indices should appear with high probability (K >> N)
        assert len(np.unique(row)) == N - 1


def test_uniform_negatives_roughly_uniform():
    N, K = 16, 100_000
    y = jnp.asarray([3])
    idx = np.asarray(draw_negatives_uniform(jax.random.key(1), y, K, N))[0]
    counts = np.bincount(idx, minlength=N)
    assert counts[3] == 0
    expected = K / (N - 1)
    assert np.all(np.abs(counts[np.arange(N) != 3] - expected) < 0.1 * expected)


def test_avoid_sorted_negatives_never_hit_positives():
    N, K, pos_k = 64, 5000, 8
    pos = jnp.asarray(
        [np.sort(np.random.default_rng(s).choice(N, pos_k, replace=False)) for s in range(3)]
    ).astype(jnp.int32)
    neg = np.asarray(draw_negatives_avoid_sorted(jax.random.key(2), pos, K, N))
    assert neg.min() >= 0 and neg.max() < N
    for row, prow in zip(neg, np.asarray(pos)):
        assert not np.intersect1d(row, prow).size
        # every non-positive index reachable
        assert len(np.unique(row)) == N - pos_k


def test_avoid_sorted_uniform_over_allowed():
    N, K, pos_k = 12, 200_000, 4
    pos = jnp.asarray([[0, 1, 10, 11]], dtype=jnp.int32)
    neg = np.asarray(draw_negatives_avoid_sorted(jax.random.key(3), pos, K, N))[0]
    counts = np.bincount(neg, minlength=N)
    allowed = np.setdiff1d(np.arange(N), [0, 1, 10, 11])
    assert counts[[0, 1, 10, 11]].sum() == 0
    expected = K / len(allowed)
    assert np.all(np.abs(counts[allowed] - expected) < 0.05 * expected)


def test_alias_sampler_matches_distribution():
    probs = np.asarray([0.1, 0.5, 0.15, 0.25])
    sampler = AliasSampler(probs)
    draws = np.asarray(sampler.draw(jax.random.key(4), (200_000,)))
    freq = np.bincount(draws, minlength=4) / draws.size
    np.testing.assert_allclose(freq, probs, atol=0.01)


def test_alias_sampler_uniform_edge():
    sampler = AliasSampler(np.ones(7))
    draws = np.asarray(sampler.draw(jax.random.key(5), (70_000,)))
    freq = np.bincount(draws, minlength=7) / draws.size
    np.testing.assert_allclose(freq, np.full(7, 1 / 7), atol=0.01)


def test_mining_approx_mode_plumbing():
    """exact=False (loss.args.sampling_args.exact) routes the sweep's
    top-k through lax.approx_max_k; on small N the candidate sets still
    essentially match the exact sweep (the mode exists for 1.78M-row
    AudioSet banks where the exact TopK dominates the sweep, PERF.md)."""
    import jax.numpy as jnp
    import numpy as np

    from avid_cma_tpu.criterions.mining import mine_positives

    rng = np.random.default_rng(0)
    n, d, k = 300, 16, 8
    bv = rng.normal(size=(n, d)).astype(np.float32)
    bv /= np.linalg.norm(bv, axis=1, keepdims=True)
    ba = rng.normal(size=(n, d)).astype(np.float32)
    ba /= np.linalg.norm(ba, axis=1, keepdims=True)
    exact = np.asarray(mine_positives(jnp.asarray(bv), jnp.asarray(ba), k))
    approx = np.asarray(
        mine_positives(jnp.asarray(bv), jnp.asarray(ba), k, exact=False)
    )
    assert approx.shape == exact.shape
    # recall of the approx sets vs exact
    hits = sum(len(set(a) & set(e)) for a, e in zip(approx, exact))
    assert hits / exact.size > 0.95
