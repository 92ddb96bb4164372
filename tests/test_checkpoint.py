"""Checkpoint fidelity tests.

The decisive one: load the actual reference torch model's weights through
the .pth.tar importer and assert the flax forward matches the torch
forward numerically (model-level parity, reference models/*).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avid_cma_tpu.criterions.avid import init_bank_state
from avid_cma_tpu.models import av_wrapper
from avid_cma_tpu.train.checkpoint import (
    export_pth_tar,
    flax_to_torch_state,
    import_criterion_pth_tar,
    import_model_pth_tar,
    torch_state_to_flax,
)

REFERENCE = "/root/reference"


def small_model():
    return av_wrapper(
        video_backbone="R2Plus1D",
        video_backbone_args={"depth": 18},
        audio_backbone="Conv2D",
        audio_backbone_args={"depth": 10},
        proj_dim=[512, 512, 128],
    )


def test_torch_flax_key_roundtrip():
    model = small_model()
    video = jnp.zeros((1, 4, 32, 32, 3))
    audio = jnp.zeros((1, 64, 65, 1))
    variables = model.init(jax.random.key(0), video, audio, train=False)
    sd = flax_to_torch_state(variables)
    back = torch_state_to_flax(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back["params"])[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # batch_stats too — VALUES, not just leaf counts (a converter that
    # swaps mean/var or zeroes running stats must fail here)
    flat_a = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back["batch_stats"])[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_pth_tar_roundtrip(tmp_path):
    model = small_model()
    video = jnp.zeros((1, 4, 32, 32, 3))
    audio = jnp.zeros((1, 64, 65, 1))
    variables = model.init(jax.random.key(1), video, audio, train=False)
    bank = init_bank_state(jax.random.key(2), 16, 128).replace(z=jnp.float32(2.5))

    path = str(tmp_path / "checkpoint.pth.tar")
    export_pth_tar(variables, path, bank=bank, epoch=7)

    back = import_model_pth_tar(path)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(back["params"])[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    bank2 = import_criterion_pth_tar(path)
    np.testing.assert_array_equal(np.asarray(bank.view1_mem), np.asarray(bank2.view1_mem))
    # view2 as well: an exporter writing view1 into the view2 slot (the
    # banks are same-shaped) must fail here
    np.testing.assert_array_equal(np.asarray(bank.view2_mem), np.asarray(bank2.view2_mem))
    assert not np.array_equal(np.asarray(bank2.view1_mem), np.asarray(bank2.view2_mem))
    assert float(bank2.z) == 2.5


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_forward_parity_with_reference_torch_model(tmp_path):
    """Gold standard: same weights, same input -> same output as the
    reference torch implementation (models/video.py, models/audio.py,
    models/av_wrapper.py), eval mode."""
    import torch

    sys.path.insert(0, REFERENCE)
    try:
        from models.av_wrapper import av_wrapper as torch_av_wrapper
    finally:
        sys.path.pop(0)

    tmodel = torch_av_wrapper(
        "R2Plus1D", {"depth": 18}, "Conv2D", {"depth": 10},
        proj_dim=[512, 512, 128],
    )
    tmodel.eval()
    # randomize BN running stats so eval-mode parity is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    path = str(tmp_path / "ref.pth.tar")
    torch.save({"model": tmodel.state_dict()}, path)
    variables = import_model_pth_tar(path)

    rng = np.random.default_rng(0)
    video = rng.normal(size=(2, 8, 64, 64, 3)).astype(np.float32)
    audio = rng.normal(size=(2, 100, 129, 1)).astype(np.float32)

    with torch.no_grad():
        tv = torch.from_numpy(np.transpose(video, (0, 4, 1, 2, 3)))  # NCTHW
        ta = torch.from_numpy(np.transpose(audio, (0, 3, 1, 2)))  # NCHW
        tv_emb, ta_emb = tmodel(tv, ta)

    model = small_model()
    v_emb, a_emb = model.apply(
        variables, jnp.asarray(video), jnp.asarray(audio), train=False
    )
    np.testing.assert_allclose(
        np.asarray(v_emb), tv_emb.numpy(), rtol=2e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(a_emb), ta_emb.numpy(), rtol=2e-3, atol=5e-4
    )


def test_milestone_checkpoints_survive_retention(tmp_path):
    """Milestone saves must survive max_to_keep garbage collection
    (reference keeps checkpoint-ep{N}.pth.tar copies permanently,
    main-avid.py:126-127 + utils/main_utils.py:271-287)."""
    from avid_cma_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "orbax"), max_to_keep=2)
    state = {"x": jnp.arange(4, dtype=jnp.float32)}
    for step in range(1, 6):
        mgr.save(step, {"x": state["x"] + step}, milestone=(step == 2))

    steps = set(mgr._mgr.all_steps())
    assert 2 in steps, "milestone step was garbage-collected"
    assert 5 in steps  # latest retained
    # the milestone set persists across manager restarts
    mgr2 = CheckpointManager(str(tmp_path / "orbax"), max_to_keep=2)
    assert 2 in set(mgr2._mgr.all_steps())
    restored = mgr2.restore({"x": jnp.zeros(4, jnp.float32)}, step=2)
    np.testing.assert_allclose(np.asarray(restored["x"]), np.arange(4) + 2)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parameter_order_matches_reference_torch():
    """reference_parameter_order must reproduce the reference
    `model.parameters()` registration order EXACTLY — torch optimizers
    index their state by it (utils/main_utils.py:290-300)."""
    import torch

    from avid_cma_tpu.train.checkpoint import reference_parameter_order

    sys.path.insert(0, REFERENCE)
    try:
        from models.av_wrapper import av_wrapper as torch_av_wrapper
    finally:
        sys.path.pop(0)

    for vdepth in (10, 18):
        tmodel = torch_av_wrapper(
            "R2Plus1D", {"depth": vdepth}, "Conv2D", {"depth": 10},
            proj_dim=[512, 512, 128],
        )
        want = [name for name, _ in tmodel.named_parameters()]
        got = reference_parameter_order(tmodel.state_dict().keys())
        assert got == want


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_optimizer_export_loads_into_reference_adam(tmp_path):
    """Export with Adam moments -> the reference's actual
    torch.optim.Adam accepts the state dict and ends up holding OUR
    moments on the right parameters (capability:
    utils/main_utils.py:271-300 save/resume with optimizer state)."""
    import optax
    import torch

    from avid_cma_tpu.train.checkpoint import (
        export_pth_tar,
        reference_parameter_order,
    )
    from avid_cma_tpu.train.optim import build_optimizer

    model = small_model()
    video = jnp.zeros((1, 4, 32, 32, 3))
    audio = jnp.zeros((1, 64, 65, 1))
    variables = model.init(jax.random.key(3), video, audio, train=False)
    params = variables["params"]

    optimizer = build_optimizer("adam", 1e-4, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    # two real optax steps so the moments are non-trivial
    for s in (4, 5):
        grads = jax.tree.map(
            lambda p, k=s: jax.random.normal(jax.random.key(k), p.shape) * 0.1,
            params,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "with_opt.pth.tar")
    export_pth_tar(
        {"params": params, "batch_stats": variables.get("batch_stats", {})},
        path, epoch=3, opt_state=opt_state,
        opt_hparams={"lr": 1e-4, "weight_decay": 1e-5},
    )

    sys.path.insert(0, REFERENCE)
    try:
        from models.av_wrapper import av_wrapper as torch_av_wrapper
    finally:
        sys.path.pop(0)
    tmodel = torch_av_wrapper(
        "R2Plus1D", {"depth": 18}, "Conv2D", {"depth": 10},
        proj_dim=[512, 512, 128],
    )
    ckp = torch.load(path, map_location="cpu", weights_only=False)
    # the model weights load (strict) and the optimizer state loads into
    # the reference's own Adam construction (utils/main_utils.py:251-256)
    tmodel.load_state_dict(
        {k.replace("module.", ""): v for k, v in ckp["model"].items()}
    )
    topt = torch.optim.Adam(tmodel.parameters(), lr=1e-4, weight_decay=1e-5)
    topt.load_state_dict(ckp["optimizer"])

    # moments landed on the right parameters: torch's parameter i must
    # hold the moment our export placed at index i
    from avid_cma_tpu.train.checkpoint import find_adam_state, flax_to_torch_state

    _, mu, _ = find_adam_state(opt_state)
    mu_t = flax_to_torch_state({"params": mu})
    order = reference_parameter_order(tmodel.state_dict().keys())
    tparams = list(tmodel.parameters())
    assert len(tparams) == len(order)
    for i in (0, 7, len(order) // 2, len(order) - 1):
        got = topt.state[tparams[i]]["exp_avg"].numpy()
        np.testing.assert_allclose(got, np.asarray(mu_t[order[i]]), rtol=1e-6)
        assert float(topt.state[tparams[i]]["step"]) == 2.0

    # and torch can actually STEP from the restored moments (batch of 2:
    # torch BN rejects 1-sample training batches)
    tv = torch.zeros((2, 3, 4, 32, 32))
    ta = torch.zeros((2, 1, 64, 65))
    loss = sum(o.square().mean() for o in tmodel(tv, ta))
    loss.backward()
    topt.step()


def test_optimizer_roundtrip_through_pth_tar(tmp_path):
    """N steps -> export -> import -> continue must match a continuous
    run: the moments survive the torch round trip bit-for-bit and the
    next update is identical."""
    import optax

    from avid_cma_tpu.train.checkpoint import (
        export_pth_tar,
        find_adam_state,
        import_optimizer_pth_tar,
    )
    from avid_cma_tpu.train.optim import build_optimizer

    model = small_model()
    video = jnp.zeros((1, 4, 32, 32, 3))
    audio = jnp.zeros((1, 64, 65, 1))
    variables = model.init(jax.random.key(6), video, audio, train=False)
    params = variables["params"]
    optimizer = build_optimizer("adam", 1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)

    def grad_at(step):
        return jax.tree.map(
            lambda p: jax.random.normal(jax.random.key(100 + step), p.shape) * 0.1,
            params,
        )

    for s in range(2):
        updates, opt_state = optimizer.update(grad_at(s), opt_state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "rt.pth.tar")
    export_pth_tar({"params": params}, path, opt_state=opt_state)
    restored = import_optimizer_pth_tar(path, params, optimizer)

    c0, mu0, nu0 = find_adam_state(opt_state)
    c1, mu1, nu1 = find_adam_state(restored)
    assert int(c0) == int(c1)
    for a, b in zip(jax.tree.leaves(mu0), jax.tree.leaves(mu1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(nu0), jax.tree.leaves(nu1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # one more identical step from both states -> identical params
    u_cont, _ = optimizer.update(grad_at(2), opt_state, params)
    u_rest, _ = optimizer.update(grad_at(2), restored, params)
    for a, b in zip(jax.tree.leaves(u_cont), jax.tree.leaves(u_rest)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_duplicate_step_tolerated(tmp_path):
    """A save_freq_steps save can land exactly on an epoch boundary; the
    epoch-end (possibly milestone) re-save of the same step must be a
    no-op, not an orbax StepAlreadyExistsError (which force=True raises
    unconditionally)."""
    from avid_cma_tpu.train.checkpoint import CheckpointManager

    m = CheckpointManager(str(tmp_path / "orbax"))
    state = {"a": jnp.ones((2,))}
    assert m.save(10, state)
    assert m.save(10, state)                  # plain duplicate
    assert m.save(10, state, milestone=True)  # milestone duplicate
    assert m.latest_step() == 10


def test_scripts_export_from_orbax_run(tmp_path):
    """`scripts/checkpoints.py export <run> <out.pth.tar>`: a framework
    orbax checkpoint (raw nested-dict restore, no typed optax states)
    exports model + banks + Adam moments (closes the reference
    round-trip without hand-written glue)."""
    import subprocess
    import sys as _sys

    import optax
    import torch

    from avid_cma_tpu.criterions.avid import init_bank_state
    from avid_cma_tpu.train.checkpoint import CheckpointManager
    from avid_cma_tpu.train.optim import build_optimizer
    from avid_cma_tpu.train.state import TrainState

    model = small_model()
    video = jnp.zeros((1, 4, 32, 32, 3))
    audio = jnp.zeros((1, 64, 65, 1))
    variables = model.init(jax.random.key(9), video, audio, train=False)
    optimizer = build_optimizer("adam", 1e-4, weight_decay=1e-5)
    params = variables["params"]
    opt_state = optimizer.init(params)
    grads = jax.tree.map(
        lambda p: jax.random.normal(jax.random.key(11), p.shape) * 0.1, params
    )
    _, opt_state = optimizer.update(grads, opt_state, params)
    state = TrainState(
        step=jnp.int32(5), epoch=jnp.int32(2), params=params,
        batch_stats=variables.get("batch_stats", {}), opt_state=opt_state,
        bank=init_bank_state(jax.random.key(12), 16, 128),
        rng=jax.random.key(0),
    )
    run_dir = tmp_path / "run"
    CheckpointManager(str(run_dir / "orbax")).save(5, state)

    out = tmp_path / "exported.pth.tar"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, "scripts/checkpoints.py", "export",
         str(run_dir), str(out)],
        cwd=repo, capture_output=True, text=True,
    )
    # no run config.yaml and no flags: export must REFUSE to invent
    # param_group hyperparameters (the reference resume adopts them)
    assert r.returncode != 0 and "--lr/--weight-decay" in (r.stderr + r.stdout)

    r = subprocess.run(
        [_sys.executable, "scripts/checkpoints.py", "export",
         str(run_dir), str(out), "--lr", "1e-4", "--weight-decay", "1e-5"],
        cwd=repo, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    ckp = torch.load(str(out), map_location="cpu", weights_only=False)
    assert set(ckp) >= {"epoch", "model", "optimizer", "train_criterion"}
    assert ckp["epoch"] == 2
    n_params = len(jax.tree.leaves(params))
    assert len(ckp["optimizer"]["state"]) == n_params
    assert float(ckp["optimizer"]["state"][0]["step"]) == 1.0
    pg = ckp["optimizer"]["param_groups"][0]
    assert pg["lr"] == 1e-4 and pg["weight_decay"] == 1e-5

    # a model_dir with the run's resolved config.yaml: hyperparameters
    # come from it, and sharded-run bank padding is trimmed to num_data
    import yaml

    from avid_cma_tpu.parallel.sharding import pad_bank_rows

    num_data = 16
    padded = state.replace(bank=state.bank.replace(
        view1_mem=pad_bank_rows(state.bank.view1_mem, 7),  # 16 -> 21 rows
        view2_mem=pad_bank_rows(state.bank.view2_mem, 7),
    ))
    run2 = tmp_path / "run2"
    CheckpointManager(str(run2 / "orbax")).save(5, padded)
    with open(run2 / "config.yaml", "w") as f:
        yaml.safe_dump({
            "optimizer": {"name": "adam", "weight_decay": 1e-5,
                          "lr": {"base_lr": 5e-4}},
            "loss": {"args": {"num_data": num_data}},
        }, f)
    out2 = tmp_path / "exported2.pth.tar"
    r = subprocess.run(
        [_sys.executable, "scripts/checkpoints.py", "export",
         str(run2), str(out2)],
        cwd=repo, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    ckp2 = torch.load(str(out2), map_location="cpu", weights_only=False)
    assert ckp2["train_criterion"]["nce_average.view1_mem"].shape[0] == num_data
    pg2 = ckp2["optimizer"]["param_groups"][0]
    assert pg2["lr"] == 5e-4 and pg2["weight_decay"] == 1e-5


def test_depth10_export_emits_bare_block_keys():
    """Reference depth-10 stages are BARE BasicR2P1DBlocks (models/
    video.py:27-31), so a depth-10 export must emit conv2x.spt_conv1.*
    (no Sequential index) or torch load_state_dict rejects it; the
    importer accepts either form, so the round-trip must also hold."""
    from avid_cma_tpu.models import av_wrapper

    model = av_wrapper(
        video_backbone="R2Plus1D",
        video_backbone_args={"depth": 10},
        audio_backbone="Conv2D",
        audio_backbone_args={"depth": 10},
        proj_dim=[64, 32],
    )
    video = jnp.zeros((1, 4, 32, 32, 3))
    audio = jnp.zeros((1, 64, 65, 1))
    variables = model.init(jax.random.key(0), video, audio, train=False)
    sd = flax_to_torch_state(variables)
    stage_keys = [k for k in sd if ".conv2x." in k]
    assert stage_keys, "no conv2x keys exported"
    for k in stage_keys:
        assert not k.split(".conv2x.")[1][0].isdigit(), (
            f"depth-10 export must use bare block keys, got {k}"
        )
    back = torch_state_to_flax(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back["params"])[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
