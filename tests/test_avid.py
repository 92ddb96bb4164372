"""AVID criterion semantics: bank EMA math, Z freeze-through-state, loss
aggregation, and SPMD replica consistency
(reference: criterions/avid.py:47-129,202-233)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from avid_cma_tpu.criterions.avid import (
    AVIDConfig,
    avid_forward,
    init_bank_state,
    l2_normalize,
    update_banks,
)


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_init_bank_state_normalized():
    st = init_bank_state(jax.random.key(0), 32, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(st.view1_mem), axis=1), 1.0, rtol=1e-5
    )
    assert float(st.z) == -1.0


def test_update_banks_matches_numpy_ema(rng):
    N, D = 16, 4
    st = init_bank_state(jax.random.key(1), N, D)
    v = _norm_rows(rng.normal(size=(3, D)).astype(np.float32))
    a = _norm_rows(rng.normal(size=(3, D)).astype(np.float32))
    y = np.asarray([2, 5, 11])

    new = update_banks(
        st, jnp.asarray(v), jnp.asarray(a), jnp.asarray(y), (0.5, 0.3)
    )
    b1, b2 = np.asarray(st.view1_mem), np.asarray(st.view2_mem)
    want1 = b1.copy()
    want1[y] = _norm_rows(b1[y] * 0.5 + v * 0.5)
    want2 = b2.copy()
    want2[y] = _norm_rows(b2[y] * 0.3 + a * 0.7)
    np.testing.assert_allclose(np.asarray(new.view1_mem), want1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.view2_mem), want2, rtol=1e-5)
    # untouched rows unchanged
    mask = np.ones(N, bool)
    mask[y] = False
    np.testing.assert_array_equal(np.asarray(new.view1_mem)[mask], b1[mask])


def test_avid_forward_loss_and_z(rng):
    N, D, bs = 64, 8, 4
    cfg = AVIDConfig(num_data=N, embedding_dim=D, num_negatives=16)
    st = init_bank_state(jax.random.key(2), N, D)
    v = jnp.asarray(rng.normal(size=(bs, D)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(bs, D)).astype(np.float32))
    y = jnp.asarray([1, 5, 9, 13])

    loss, tb, st1 = avid_forward(st, v, a, y, jax.random.key(3), cfg)
    assert np.isfinite(float(loss))
    assert float(st1.z) > 0
    assert "Loss/v2a" in tb and "Loss/a2v" in tb and "Loss/v2v" not in tb
    # second step: z unchanged (frozen)
    _, _, st2 = avid_forward(st1, v, a, y, jax.random.key(4), cfg)
    assert float(st2.z) == float(st1.z)
    # banks moved toward the (normalized) embeddings
    assert not np.allclose(np.asarray(st1.view1_mem), np.asarray(st.view1_mem))


def test_avid_forward_wmodal_heads(rng):
    cfg = AVIDConfig(
        num_data=32, embedding_dim=8, num_negatives=8,
        xModal_coeff=1.0, wModal_coeff=1.0,
    )
    st = init_bank_state(jax.random.key(0), 32, 8)
    v = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    loss, tb, _ = avid_forward(st, v, a, jnp.asarray([0, 1]), jax.random.key(1), cfg)
    for head in ("v2a", "a2v", "v2v", "a2a"):
        assert f"Loss/{head}" in tb
    want = 0.5 * float(tb["Loss/xModal"]) + 0.5 * float(tb["Loss/wModal"])
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_avid_spmd_banks_replica_identical(mesh, rng):
    """Under shard_map DP, every replica must apply the same bank update
    (reference keeps replicated banks in sync via all_gather,
    criterions/avid.py:103-115)."""
    N, D = 64, 8
    n_dev = mesh.size
    per_dev = 2
    bs = n_dev * per_dev
    cfg = AVIDConfig(num_data=N, embedding_dim=D, num_negatives=8)
    st = init_bank_state(jax.random.key(5), N, D)

    v = jnp.asarray(rng.normal(size=(bs, D)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(bs, D)).astype(np.float32))
    y = jnp.arange(bs, dtype=jnp.int32) * 3

    def step(st, v, a, y):
        key = jax.random.fold_in(jax.random.key(7), jax.lax.axis_index("data"))
        loss, _, new_st = avid_forward(st, v, a, y, key, cfg, axis_name="data")
        return jax.lax.pmean(loss, "data"), new_st

    loss, new_st = jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,  # replica identity proven dynamically below
        )
    )(st, v, a, y)
    assert np.isfinite(float(loss))

    # the gathered-update must equal a single-device update on the global batch
    single = update_banks(
        st.replace(z=new_st.z), l2_normalize(v), l2_normalize(a), y, cfg.momentum
    )
    np.testing.assert_allclose(
        np.asarray(new_st.view1_mem), np.asarray(single.view1_mem), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_st.view2_mem), np.asarray(single.view2_mem), rtol=2e-5, atol=1e-6
    )


def test_avid_gradients_wrt_embeddings(rng):
    cfg = AVIDConfig(num_data=32, embedding_dim=8, num_negatives=8)
    st = init_bank_state(jax.random.key(0), 32, 8)
    v = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))

    def loss_fn(v, a):
        loss, _, _ = avid_forward(st, v, a, jnp.asarray([0, 1]), jax.random.key(1), cfg)
        return loss

    gv, ga = jax.grad(loss_fn, argnums=(0, 1))(v, a)
    assert np.all(np.isfinite(np.asarray(gv))) and np.any(np.asarray(gv) != 0)
    assert np.all(np.isfinite(np.asarray(ga))) and np.any(np.asarray(ga) != 0)
