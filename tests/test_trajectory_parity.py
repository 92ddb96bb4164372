"""Full-training-trajectory parity vs the reference torch stack.

The strongest form of the 'NCE loss curves within 1%' contract
(BASELINE.md): run SEVERAL complete optimization steps — model forward
(train-mode BN), AVID criterion (NCE + frozen-Z + bank EMA), backward,
Adam — in BOTH stacks from identical weights, data, and negative draws,
and require the loss trajectories and final parameters to agree.

torch side: the actual reference implementation
(/root/reference/models/*, /root/reference/criterions/avid.py) with
torch.optim.Adam. JAX side: this framework's model + avid_forward +
build_optimizer('adam'). Single-step criterion parity is pinned by
test_reference_parity.py; this test additionally covers the coupled
dynamics (BN batch stats -> embeddings -> bank EMA -> next-step loss,
optimizer moment accumulation) over multiple steps.
"""

import os
import sys

import jax
import numpy as np
import pytest

jnp = None  # set in _lazy_imports to keep flake order happy

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference not mounted"
)

STEPS = 6
B, N, NEG, D = 4, 48, 12, 128
POS_K, NEG_W = 4, 6  # CMA trajectory: positive-set size / within-modal negs


def _lazy_imports():
    global jnp
    import jax.numpy as jnp_mod

    jnp = jnp_mod


@pytest.fixture()
def stacks(monkeypatch, tmp_path):
    """Build torch reference stack + our stack from the same init."""
    import torch

    _lazy_imports()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        import criterions.avid as ref_avid
        from models.av_wrapper import av_wrapper as torch_av_wrapper

        importlib.reload(ref_avid)

        torch.manual_seed(0)
        tmodel = torch_av_wrapper(
            "R2Plus1D", {"depth": 10}, "Conv2D", {"depth": 10},
            proj_dim=[512, 512, D],
        )
        tmodel.train()
        path = str(tmp_path / "init.pth.tar")
        torch.save({"model": tmodel.state_dict()}, path)

        crit = ref_avid.AVID(
            num_data=N, embedding_dim=D, num_negatives=NEG,
            momentum=0.5, xModal_coeff=1.0, wModal_coeff=0.0,
        )
        yield tmodel, crit, path
    finally:
        sys.path.pop(0)


def test_training_trajectory_parity(stacks):
    import torch

    import avid_cma_tpu.criterions.avid as mine
    from avid_cma_tpu.criterions.avid import AVIDConfig, BankState, avid_forward
    from avid_cma_tpu.models import av_wrapper
    from avid_cma_tpu.train.checkpoint import import_model_pth_tar
    from avid_cma_tpu.train.optim import build_optimizer

    tmodel, crit, init_path = stacks
    rng = np.random.default_rng(0)

    # shared data: two alternating batches, fixed per-step negatives
    videos = rng.normal(size=(2, B, 8, 64, 64, 3)).astype(np.float32)
    audios = rng.normal(size=(2, B, 100, 129, 1)).astype(np.float32)
    ys = np.stack([
        rng.choice(N, B, replace=False) for _ in range(2)
    ]).astype(np.int64)
    negs = []
    for s in range(STEPS):
        y = ys[s % 2]
        negs.append(np.stack([
            rng.choice(np.setdiff1d(np.arange(N), [yi]), NEG, replace=True)
            for yi in y
        ]).astype(np.int64))

    bank_v = rng.normal(size=(N, D)).astype(np.float32)
    bank_a = rng.normal(size=(N, D)).astype(np.float32)
    bank_v /= np.linalg.norm(bank_v, axis=1, keepdims=True)
    bank_a /= np.linalg.norm(bank_a, axis=1, keepdims=True)

    lr = 1e-4  # the reference pretrain lr; larger lrs amplify f32
    # reassociation noise chaotically and defeat any fixed tolerance

    # ---------------- torch reference trajectory ----------------
    with torch.no_grad():
        crit.nce_average.view1_mem.copy_(torch.from_numpy(bank_v))
        crit.nce_average.view2_mem.copy_(torch.from_numpy(bank_a))
    step_holder = [0]
    crit.nce_average.sample_negatives = (
        lambda yy, KK: torch.from_numpy(negs[step_holder[0]])
    )
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    t_losses = []
    for s in range(STEPS):
        step_holder[0] = s
        v = torch.from_numpy(np.transpose(videos[s % 2], (0, 4, 1, 2, 3)))
        a = torch.from_numpy(np.transpose(audios[s % 2], (0, 3, 1, 2)))
        y = torch.from_numpy(ys[s % 2])
        ve, ae = tmodel(v, a)
        loss, _ = crit(ve, ae, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---------------- our trajectory ----------------
    variables = import_model_pth_tar(init_path)
    model = av_wrapper(
        video_backbone="R2Plus1D", video_backbone_args={"depth": 10},
        audio_backbone="Conv2D", audio_backbone_args={"depth": 10},
        proj_dim=[512, 512, D],
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    cfg = AVIDConfig(num_data=N, embedding_dim=D, num_negatives=NEG,
                     momentum=0.5)
    bank = BankState(view1_mem=jnp.asarray(bank_v),
                     view2_mem=jnp.asarray(bank_a), z=jnp.float32(-1.0))
    tx = build_optimizer("adam", lambda _: lr, weight_decay=0.0)
    opt_state = tx.init(params)

    orig_draw = mine.draw_negatives_uniform
    j_losses = []
    try:
        for s in range(STEPS):
            mine.draw_negatives_uniform = (
                lambda key, yy, KK, NN, _s=s: jnp.asarray(
                    negs[_s].astype(np.int32))
            )
            video = jnp.asarray(videos[s % 2])
            audio = jnp.asarray(audios[s % 2])
            y = jnp.asarray(ys[s % 2].astype(np.int32))

            def loss_fn(p, bstats, bank):
                (ve, ae), mut = model.apply(
                    {"params": p, "batch_stats": bstats},
                    video, audio, train=True, mutable=["batch_stats"],
                )
                loss, _, new_bank = avid_forward(
                    bank, ve, ae, y, jax.random.key(0), cfg
                )
                return loss, (mut["batch_stats"], new_bank)

            (loss, (batch_stats, bank)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, bank)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))
    finally:
        mine.draw_negatives_uniform = orig_draw

    # loss curves within 1% per step (the BASELINE.md contract)
    for s, (tj, jj) in enumerate(zip(t_losses, j_losses)):
        assert abs(jj - tj) / abs(tj) < 1e-2, (
            f"step {s}: torch {tj} vs ours {jj} ({t_losses} vs {j_losses})"
        )

    # frozen partition function identical
    np.testing.assert_allclose(
        float(bank.z), float(crit.criterion.avg_exp_score), rtol=1e-4
    )
    # banks evolved together. Untouched rows must be EXACT (any drift
    # there means the EMA scatter wrote rows it shouldn't); the rows
    # EMA'd each step carry the compounded embedding drift and get the
    # loose bound (single-step bank parity is pinned to 1e-4 in
    # test_reference_parity.py).
    ours_bank = np.asarray(bank.view1_mem)
    ref_bank = crit.nce_average.view1_mem.detach().numpy()
    touched = np.unique(np.concatenate([ys[0], ys[1]]))
    untouched = np.setdiff1d(np.arange(N), touched)
    np.testing.assert_array_equal(ours_bank[untouched], bank_v[untouched])
    np.testing.assert_array_equal(ref_bank[untouched], bank_v[untouched])
    np.testing.assert_allclose(
        ours_bank[touched], ref_bank[touched], rtol=1e-3, atol=5e-2,
    )
    # final stem weights agree within the total Adam step budget
    # (STEPS*lr): Adam normalizes gradients to +-lr, so weights whose
    # gradient hovers near zero legitimately step in different
    # directions across stacks — but a layout/mapping bug would show up
    # at weight scale (~1e-2), an order of magnitude above this bound.
    t_sd = tmodel.state_dict()
    t_stem = t_sd["video_model.conv1.0.weight"].numpy()  # (64,3,3,7,7)
    j_stem = np.transpose(
        np.asarray(params["video_model"]["conv1"]["kernel"]), (4, 3, 0, 1, 2)
    )
    np.testing.assert_allclose(j_stem, t_stem, atol=2 * STEPS * lr)


@pytest.fixture()
def cma_stacks(monkeypatch, tmp_path):
    """Torch reference AVID_CMA stack + shared model init (CMA variant of
    `stacks`; mining is skipped at construction and the positive set is
    injected identically on both sides)."""
    import torch

    _lazy_imports()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        import criterions.avid as ref_avid
        import criterions.avid_cma as ref_cma
        from models.av_wrapper import av_wrapper as torch_av_wrapper

        importlib.reload(ref_avid)
        importlib.reload(ref_cma)  # rebind to the reloaded avid classes

        torch.manual_seed(0)
        tmodel = torch_av_wrapper(
            "R2Plus1D", {"depth": 10}, "Conv2D", {"depth": 10},
            proj_dim=[512, 512, D],
        )
        tmodel.train()
        path = str(tmp_path / "init.pth.tar")
        torch.save({"model": tmodel.state_dict()}, path)

        crit = ref_cma.AVID_CMA(
            num_data=N, embedding_dim=D, num_negatives=NEG,
            num_negatives_within=NEG_W, momentum=0.5,
            xModalInstCoeff=1.0, wModalInstCoeff=0.0,
            xModalPosCoeff=0.0, wModalPosCoeff=1.0,
            sampling_args={"type": "consensus", "pos_k": 0},  # skip mining
            resample_freq=-1,
        )
        yield tmodel, crit, path
    finally:
        sys.path.pop(0)


def test_cma_training_trajectory_parity(cma_stacks):
    """The trajectory contract on the flagship 4-head AVID-CMA criterion
    (reference criterions/avid_cma.py:150-194,325-359): positive-set
    discrimination + instance discrimination + bank EMA + frozen-Z +
    Adam over STEPS coupled optimization steps."""
    import torch

    import avid_cma_tpu.criterions.avid_cma as mine_cma
    from avid_cma_tpu.criterions.avid_cma import (
        AVIDCMAConfig,
        CMAState,
        cma_forward,
    )
    from avid_cma_tpu.criterions.mining import mine_positives
    from avid_cma_tpu.models import av_wrapper
    from avid_cma_tpu.train.checkpoint import import_model_pth_tar
    from avid_cma_tpu.train.optim import build_optimizer

    tmodel, crit, init_path = cma_stacks
    rng = np.random.default_rng(1)

    videos = rng.normal(size=(2, B, 8, 64, 64, 3)).astype(np.float32)
    audios = rng.normal(size=(2, B, 100, 129, 1)).astype(np.float32)
    ys = np.stack([
        rng.choice(N, B, replace=False) for _ in range(2)
    ]).astype(np.int64)

    bank_v = rng.normal(size=(N, D)).astype(np.float32)
    bank_a = rng.normal(size=(N, D)).astype(np.float32)
    bank_v /= np.linalg.norm(bank_v, axis=1, keepdims=True)
    bank_a /= np.linalg.norm(bank_a, axis=1, keepdims=True)

    # one positive set, mined from the initial banks by OUR sweep
    # (mined-set parity vs the reference math is pinned separately in
    # test_reference_parity.py), injected into both stacks
    pos = np.asarray(mine_positives(
        jnp.asarray(bank_v), jnp.asarray(bank_a), POS_K, "consensus",
        tile=16,
    ))

    # per-step negatives avoiding self AND the sorted positive set
    negs = []
    for s in range(STEPS):
        y = ys[s % 2]
        negs.append(np.stack([
            rng.choice(
                np.setdiff1d(np.arange(N), np.concatenate([[yi], pos[yi]])),
                NEG, replace=True,
            )
            for yi in y
        ]).astype(np.int64))

    lr = 1e-4

    # ---------------- torch reference trajectory ----------------
    with torch.no_grad():
        crit.nce_average.view1_mem.copy_(torch.from_numpy(bank_v))
        crit.nce_average.view2_mem.copy_(torch.from_numpy(bank_a))
    crit.nce_average.register_buffer(
        "positive_set", torch.from_numpy(pos.astype(np.int64))
    )
    crit.nce_average.sampling_args = {"type": "consensus", "pos_k": POS_K}
    step_holder = [0]
    crit.nce_average.memory_sampling = lambda yy: (
        torch.from_numpy(pos[ys[step_holder[0] % 2]].astype(np.int64)),
        torch.from_numpy(negs[step_holder[0]]),
    )
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    t_losses = []
    for s in range(STEPS):
        step_holder[0] = s
        v = torch.from_numpy(np.transpose(videos[s % 2], (0, 4, 1, 2, 3)))
        a = torch.from_numpy(np.transpose(audios[s % 2], (0, 3, 1, 2)))
        y = torch.from_numpy(ys[s % 2])
        ve, ae = tmodel(v, a)
        loss, _ = crit(ve, ae, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---------------- our trajectory ----------------
    variables = import_model_pth_tar(init_path)
    model = av_wrapper(
        video_backbone="R2Plus1D", video_backbone_args={"depth": 10},
        audio_backbone="Conv2D", audio_backbone_args={"depth": 10},
        proj_dim=[512, 512, D],
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    cfg = AVIDCMAConfig(
        num_data=N, embedding_dim=D, num_negatives=NEG,
        num_negatives_within=NEG_W, momentum=0.5, pos_k=POS_K,
    )
    state = CMAState(
        view1_mem=jnp.asarray(bank_v), view2_mem=jnp.asarray(bank_a),
        z=jnp.float32(-1.0),
        positive_set=jnp.asarray(pos.astype(np.int32)),
    )
    tx = build_optimizer("adam", lambda _: lr, weight_decay=0.0)
    opt_state = tx.init(params)

    orig_draw = mine_cma.draw_negatives_avoid_sorted
    j_losses = []
    try:
        for s in range(STEPS):
            mine_cma.draw_negatives_avoid_sorted = (
                lambda key, ps, KK, NN, _s=s: jnp.asarray(
                    negs[_s].astype(np.int32))
            )
            video = jnp.asarray(videos[s % 2])
            audio = jnp.asarray(audios[s % 2])
            y = jnp.asarray(ys[s % 2].astype(np.int32))

            def loss_fn(p, bstats, state):
                (ve, ae), mut = model.apply(
                    {"params": p, "batch_stats": bstats},
                    video, audio, train=True, mutable=["batch_stats"],
                )
                loss, _, new_state = cma_forward(
                    state, ve, ae, y, jax.random.key(0), cfg
                )
                return loss, (mut["batch_stats"], new_state)

            (loss, (batch_stats, state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, state)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))
    finally:
        mine_cma.draw_negatives_avoid_sorted = orig_draw

    # loss curves within 1% per step (the BASELINE.md contract, now on
    # the 4-head flagship criterion)
    for s, (tj, jj) in enumerate(zip(t_losses, j_losses)):
        assert abs(jj - tj) / abs(tj) < 1e-2, (
            f"step {s}: torch {tj} vs ours {jj} ({t_losses} vs {j_losses})"
        )

    # frozen partition function identical
    np.testing.assert_allclose(
        float(state.z), float(crit.criterion.avg_exp_score), rtol=1e-4
    )
    # banks: untouched rows EXACT, EMA'd rows within compounded drift
    ours_bank = np.asarray(state.view1_mem)
    ref_bank = crit.nce_average.view1_mem.detach().numpy()
    touched = np.unique(np.concatenate([ys[0], ys[1]]))
    untouched = np.setdiff1d(np.arange(N), touched)
    np.testing.assert_array_equal(ours_bank[untouched], bank_v[untouched])
    np.testing.assert_array_equal(ref_bank[untouched], bank_v[untouched])
    np.testing.assert_allclose(
        ours_bank[touched], ref_bank[touched], rtol=1e-3, atol=5e-2,
    )
    # positive set untouched by the trajectory on both sides
    np.testing.assert_array_equal(
        np.asarray(state.positive_set), pos.astype(np.int32)
    )
    np.testing.assert_array_equal(
        crit.nce_average.positive_set.numpy(), pos.astype(np.int64)
    )
