"""End-to-end train-step tests on the 8-device CPU mesh: one jitted SPMD
program covering model fwd, criterion, grads, optimizer and bank update."""

import jax
import jax.numpy as jnp
import numpy as np

from avid_cma_tpu.criterions import (
    AVIDCMAConfig,
    AVIDConfig,
    cma_state_from_bank,
    init_bank_state,
    mine_positives,
)
from avid_cma_tpu.models import av_wrapper
from avid_cma_tpu.train.optim import build_optimizer, multistep_schedule
from avid_cma_tpu.train.step import init_train_state, make_train_step


def tiny_model():
    return av_wrapper(
        video_backbone="R2Plus1D",
        video_backbone_args={"depth": 10},
        audio_backbone="Conv2D",
        audio_backbone_args={"depth": 10},
        proj_dim=[64, 32],
    )


def tiny_batch(bs, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    return {
        "frames": jax.random.normal(k1, (bs, 4, 32, 32, 3)),
        "audio": jax.random.normal(k2, (bs, 64, 65, 1)),
        "index": jnp.arange(bs, dtype=jnp.int32),
    }


def test_avid_train_step_runs_and_learns(mesh):
    bs = mesh.size * 2
    model = tiny_model()
    cfg = AVIDConfig(num_data=64, embedding_dim=32, num_negatives=8)
    opt = build_optimizer("adam", multistep_schedule(1e-3, [10], 1.0, 5))
    batch = tiny_batch(bs)
    state = init_train_state(jax.random.key(0), model, batch, opt, cfg)
    step = make_train_step(model, cfg, opt, mesh, donate=False)

    state1, m1 = step(state, batch)
    assert int(state1.step) == 1
    assert np.isfinite(float(m1["loss"]))
    assert float(state1.bank.z) > 0

    losses = [float(m1["loss"])]
    for _ in range(4):
        state1, m = step(state1, batch)
        losses.append(float(m["loss"]))
    # same batch repeated: loss must decrease as embeddings align with
    # their own (EMA-moving) bank rows
    assert losses[-1] < losses[0], losses

    # params actually moved
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(state1.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_cma_train_step_runs(mesh):
    bs = mesh.size
    model = tiny_model()
    cfg = AVIDCMAConfig(
        num_data=32, embedding_dim=32, num_negatives=8,
        num_negatives_within=4, pos_k=2,
    )
    opt = build_optimizer("adam", 1e-3)
    batch = tiny_batch(bs, key=1)
    state = init_train_state(jax.random.key(1), model, batch, opt, criterion_cfg=None)
    bank = init_bank_state(jax.random.key(2), cfg.num_data, cfg.embedding_dim)
    pos = mine_positives(bank.view1_mem, bank.view2_mem, cfg.pos_k, "consensus",
                         tile=8, mesh=mesh)
    state = state.replace(bank=cma_state_from_bank(bank, pos))
    step = make_train_step(model, cfg, opt, mesh, donate=False)

    state1, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    for head in ("inst-v2a", "pos-v2v"):
        assert f"Loss/{head}" in m
    np.testing.assert_array_equal(
        np.asarray(state1.bank.positive_set), np.asarray(pos)
    )


def test_batch_stats_stay_replicated(mesh):
    bs = mesh.size * 2
    model = tiny_model()
    cfg = AVIDConfig(num_data=64, embedding_dim=32, num_negatives=8)
    opt = build_optimizer("sgd", 1e-2, momentum=0.9)
    batch = tiny_batch(bs, key=3)
    state = init_train_state(jax.random.key(3), model, batch, opt, cfg)
    step = make_train_step(model, cfg, opt, mesh, donate=False)
    state1, _ = step(state, batch)
    # the carried batch_stats must be REPLICATED (the step pmean's the
    # per-replica BN stats): every device's shard holds identical values
    for leaf in jax.tree.leaves(state1.batch_stats):
        assert np.all(np.isfinite(np.asarray(leaf)))
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == mesh.size  # fully replicated over the mesh
        for s in shards[1:]:
            np.testing.assert_array_equal(s, shards[0])
