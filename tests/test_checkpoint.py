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

from avid_cma_tpu.criterions.avid import BankState, init_bank_state
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
    # batch_stats too
    flat_a = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back["batch_stats"])[0]
    assert len(flat_a) == len(flat_b)


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
