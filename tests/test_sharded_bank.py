"""Row-sharded bank mode: sharded gathers/updates must match the
replicated path bit-for-bit (parallel/sharding.py; SURVEY §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from avid_cma_tpu.criterions import (
    AVIDCMAConfig,
    AVIDConfig,
    cma_state_from_bank,
    init_bank_state,
    mine_positives,
)
from avid_cma_tpu.parallel.sharding import (
    ema_update_rows_sharded,
    gather_rows_sharded,
    shard_bank,
)
from avid_cma_tpu.train.optim import build_optimizer
from avid_cma_tpu.train.step import init_train_state, make_train_step
from tests.test_train_step import tiny_batch, tiny_model


def test_gather_rows_sharded_matches_local(mesh, rng):
    n_dev = mesh.size
    N, D = 8 * n_dev, 16
    bank = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(4, 7)).astype(np.int32))

    got = jax.jit(
        jax.shard_map(
            lambda b, i: gather_rows_sharded(b, i, "data"),
            mesh=mesh, in_specs=(P("data", None), P()), out_specs=P(),
            check_vma=False,
        )
    )(bank, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bank[idx]))


def test_ema_update_rows_sharded_matches_local(mesh, rng):
    n_dev = mesh.size
    N, D = 4 * n_dev, 8
    bank = rng.normal(size=(N, D)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    y = jnp.asarray([1, 3, N - 1], dtype=jnp.int32)
    emb = rng.normal(size=(3, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    got = jax.jit(
        jax.shard_map(
            lambda b, yy, e: ema_update_rows_sharded(b, yy, e, 0.5, "data"),
            mesh=mesh,
            in_specs=(P("data", None), P(), P()),
            out_specs=P("data", None),
            check_vma=False,
        )
    )(jnp.asarray(bank), y, jnp.asarray(emb))

    want = bank.copy()
    upd = bank[np.asarray(y)] * 0.5 + emb * 0.5
    want[np.asarray(y)] = upd / np.linalg.norm(upd, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_avid_step_sharded_matches_replicated(mesh):
    n_dev = mesh.size
    bs = n_dev * 2
    N = 8 * n_dev
    model = tiny_model()
    cfg = AVIDConfig(num_data=N, embedding_dim=32, num_negatives=8)
    opt = build_optimizer("adam", 1e-3)
    batch = tiny_batch(bs, key=5)
    batch["index"] = jnp.arange(bs, dtype=jnp.int32) * 2

    state_r = init_train_state(jax.random.key(9), model, batch, opt, cfg)
    step_r = make_train_step(model, cfg, opt, mesh, donate=False)
    out_r, m_r = step_r(state_r, batch)

    bank_s = state_r.bank.replace(
        view1_mem=shard_bank(state_r.bank.view1_mem, mesh),
        view2_mem=shard_bank(state_r.bank.view2_mem, mesh),
    )
    state_s = state_r.replace(bank=bank_s)
    step_s = make_train_step(
        model, cfg, opt, mesh, donate=False, bank_sharding="sharded"
    )
    out_s, m_s = step_s(state_s, batch)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_r["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_s.bank.view1_mem)[:N],
        np.asarray(out_r.bank.view1_mem),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(out_s.bank.z), float(out_r.bank.z), rtol=1e-5)


def test_cma_step_sharded_matches_replicated(mesh):
    n_dev = mesh.size
    bs = n_dev
    N = 8 * n_dev
    model = tiny_model()
    cfg = AVIDCMAConfig(
        num_data=N, embedding_dim=32, num_negatives=8,
        num_negatives_within=4, pos_k=2,
    )
    opt = build_optimizer("adam", 1e-3)
    batch = tiny_batch(bs, key=6)

    bank = init_bank_state(jax.random.key(11), N, 32)
    pos = mine_positives(bank.view1_mem, bank.view2_mem, 2, "consensus", tile=8)
    cma = cma_state_from_bank(bank, pos)

    state_r = init_train_state(jax.random.key(12), model, batch, opt)
    state_r = state_r.replace(bank=cma)
    step_r = make_train_step(model, cfg, opt, mesh, donate=False)
    out_r, m_r = step_r(state_r, batch)

    cma_s = cma.replace(
        view1_mem=shard_bank(cma.view1_mem, mesh),
        view2_mem=shard_bank(cma.view2_mem, mesh),
        positive_set=shard_bank(cma.positive_set, mesh),
    )
    state_s = state_r.replace(bank=cma_s)
    step_s = make_train_step(
        model, cfg, opt, mesh, donate=False, bank_sharding="sharded"
    )
    out_s, m_s = step_s(state_s, batch)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_r["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_s.bank.view2_mem)[:N],
        np.asarray(out_r.bank.view2_mem),
        rtol=1e-5, atol=1e-6,
    )
