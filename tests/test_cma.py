"""CMA mining + criterion tests vs numpy brute force
(reference: criterions/avid_cma.py:24-123,150-209,325-364)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avid_cma_tpu.criterions.avid import init_bank_state
from avid_cma_tpu.criterions.avid_cma import (
    AVIDCMAConfig,
    cma_forward,
    cma_state_from_bank,
    should_resample,
)
from avid_cma_tpu.criterions.mining import mine_positives


def numpy_mine(bank_v, bank_a, pos_k, kind):
    """Brute-force agreement top-k, self removed, rows sorted."""
    sim_v = bank_v @ bank_v.T
    sim_a = bank_a @ bank_a.T
    agree = {
        "consensus": np.minimum(sim_v, sim_a),
        "union": np.maximum(sim_v, sim_a),
        "video": sim_v,
        "audio": sim_a,
    }[kind]
    np.fill_diagonal(agree, -np.inf)
    idx = np.argsort(-agree, axis=1, kind="stable")[:, :pos_k]
    return np.sort(idx, axis=1)


def _banks(rng, n=40, d=6):
    v = rng.normal(size=(n, d)).astype(np.float32)
    a = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    return v, a


@pytest.mark.parametrize("kind", ["consensus", "union", "video", "audio"])
def test_mining_matches_numpy(rng, kind):
    v, a = _banks(rng)
    got = np.asarray(mine_positives(jnp.asarray(v), jnp.asarray(a), 5, kind, tile=16))
    want = numpy_mine(v, a, 5, kind)
    np.testing.assert_array_equal(got, want)


def test_mining_non_divisible_tile(rng):
    v, a = _banks(rng, n=37)
    got = np.asarray(mine_positives(jnp.asarray(v), jnp.asarray(a), 4, "consensus", tile=16))
    want = numpy_mine(v, a, 4, "consensus")
    np.testing.assert_array_equal(got, want)


def test_mining_sharded_matches_local(mesh, rng):
    v, a = _banks(rng, n=52)
    local = np.asarray(mine_positives(jnp.asarray(v), jnp.asarray(a), 4, "consensus", tile=8))
    sharded = np.asarray(
        mine_positives(jnp.asarray(v), jnp.asarray(a), 4, "consensus", tile=8, mesh=mesh)
    )
    np.testing.assert_array_equal(sharded, local)


def test_should_resample():
    # reference: avid_cma.py:361-364 — every resample_freq epochs, not epoch 0
    assert not should_resample(0, 5)
    assert not should_resample(4, 5)
    assert should_resample(5, 5)
    assert should_resample(10, 5)
    assert not should_resample(10, -1)


def test_cma_forward_heads_and_loss(rng):
    N, D, bs, pos_k = 48, 8, 4, 4
    cfg = AVIDCMAConfig(
        num_data=N, embedding_dim=D, num_negatives=16,
        num_negatives_within=8, pos_k=pos_k,
    )
    bank = init_bank_state(jax.random.key(0), N, D)
    pos_set = mine_positives(bank.view1_mem, bank.view2_mem, pos_k, "consensus", tile=16)
    st = cma_state_from_bank(bank, pos_set)

    v = jnp.asarray(rng.normal(size=(bs, D)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(bs, D)).astype(np.float32))
    y = jnp.asarray([0, 1, 2, 3])
    loss, tb, st1 = cma_forward(st, v, a, y, jax.random.key(1), cfg)

    assert np.isfinite(float(loss))
    for head in ("inst-v2a", "inst-a2v", "pos-v2v", "pos-a2a"):
        assert f"Loss/{head}" in tb
    assert "Loss/pos-v2a" not in tb  # xModalPos off in AVID-CMA config
    # default coeffs: (1 + 1) normalized -> 0.5/0.5 between xInst and wPos
    want = 0.5 * float(tb["Loss/xModalInst"]) + 0.5 * float(tb["Loss/wModalPos"])
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)
    assert float(st1.z) > 0
    # positive_set carried through the state transition
    np.testing.assert_array_equal(np.asarray(st1.positive_set), np.asarray(pos_set))


def test_cma_within_modal_negative_truncation(rng):
    """pos-v2v/a2a use only the first num_negatives_within negatives
    (reference: avid_cma.py:186-189)."""
    N, D, pos_k = 32, 4, 2
    cfg_full = AVIDCMAConfig(
        num_data=N, embedding_dim=D, num_negatives=8,
        num_negatives_within=None, pos_k=pos_k,
    )
    cfg_trunc = AVIDCMAConfig(
        num_data=N, embedding_dim=D, num_negatives=8,
        num_negatives_within=8, pos_k=pos_k,
    )
    cfg_fewer = AVIDCMAConfig(
        num_data=N, embedding_dim=D, num_negatives=8,
        num_negatives_within=3, pos_k=pos_k,
    )
    bank = init_bank_state(jax.random.key(2), N, D)
    pos_set = mine_positives(bank.view1_mem, bank.view2_mem, pos_k, "consensus", tile=8)
    st = cma_state_from_bank(bank, pos_set)
    v = jnp.asarray(rng.normal(size=(2, D)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(2, D)).astype(np.float32))
    y = jnp.asarray([0, 1])
    l1, _, _ = cma_forward(st, v, a, y, jax.random.key(3), cfg_full)
    l2, _, _ = cma_forward(st, v, a, y, jax.random.key(3), cfg_trunc)
    # truncation to the full K is identity
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    # a REAL truncation (3 of 8) must change the within-modal losses —
    # an implementation ignoring num_negatives_within would match l1
    l3, _, _ = cma_forward(st, v, a, y, jax.random.key(3), cfg_fewer)
    assert abs(float(l3) - float(l1)) > 1e-6
