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
    scores_sharded,
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


def test_gather_rows_sharded_per_replica_idx(mesh, rng):
    """Regression: per-replica (non-replicated) indices must gather each
    replica's OWN rows — a bare psum of masked gathers mixes requests."""
    n_dev = mesh.size
    N, D, k = 8 * n_dev, 16, 3
    bank = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(n_dev, k)).astype(np.int32))

    got = jax.jit(
        jax.shard_map(
            lambda b, i: jax.lax.all_gather(
                gather_rows_sharded(b, i[0], "data"), "data"
            ),
            mesh=mesh, in_specs=(P("data", None), P("data")), out_specs=P(),
            check_vma=False,
        )
    )(bank, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bank[idx]))


def test_scores_sharded_values_and_grads(mesh, rng):
    """Fused score psum == dense bank[idx]·q, and d(score)/d(query) matches
    the dense einsum, per replica."""
    n_dev = mesh.size
    N, D, K = 8 * n_dev, 16, 5
    bs = 2 * n_dev
    bank = rng.normal(size=(N, D)).astype(np.float32)
    q = rng.normal(size=(bs, D)).astype(np.float32)
    idx = rng.integers(0, N, size=(bs, K)).astype(np.int32)

    def local(bk, qq, ii):
        def f(qq):
            return scores_sharded(bk, ii, qq, "data").sum()

        val, g = jax.value_and_grad(f)(qq)
        return (
            jax.lax.psum(val, "data"),
            jax.lax.all_gather(g, "data", tiled=True),
        )

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data", None), P("data"), P("data")),
            out_specs=(P(), P()), check_vma=False,
        )
    )
    val, grads = fn(
        shard_bank(jnp.asarray(bank), mesh), jnp.asarray(q), jnp.asarray(idx)
    )
    want_s = np.einsum("bkd,bd->bk", bank[idx], q)
    want_g = bank[idx].sum(axis=1)
    np.testing.assert_allclose(float(val), want_s.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads), want_g, rtol=1e-5, atol=1e-5)


def test_scores_sharded_bwd_keeps_query_dtype(mesh, rng):
    """bf16 queries against an f32 bank must get a bf16 cotangent back —
    an f32 dq would silently promote the whole model backward to f32
    (same invariant as ops/pallas/nce_gather's VJP)."""
    n_dev = mesh.size
    N, D, K = 4 * n_dev, 8, 3
    bs = n_dev
    bank = rng.normal(size=(N, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(bs, D)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=(bs, K)), jnp.int32)

    def local(bk, qq, ii):
        g = jax.grad(lambda x: scores_sharded(bk, ii, x, "data")
                     .astype(jnp.float32).sum())(qq)
        return jax.lax.all_gather(g, "data", tiled=True)

    g = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data", None), P("data"), P("data")),
            out_specs=P(), check_vma=False,
        )
    )(shard_bank(jnp.asarray(bank), mesh), q, idx)
    assert g.dtype == jnp.bfloat16


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
