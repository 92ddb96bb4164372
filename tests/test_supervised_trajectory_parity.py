"""Trajectory parity for the SUPERVISED eval stack vs the reference torch
implementation — the loop the reference's headline numbers come from.

Two trajectories, each run through OUR PRODUCTION step functions
(train/eval_loop.py make_supervised_train_step on a 1-device mesh so BN
normalizes over the same batch as torch) and the reference's actual
modules + run_phase math:

  * full finetune: ClassificationWrapper (backbone tap -> Linear) with a
    warmup-masked prefix (classifier-only Adam; reference
    eval-action-recg.py:74-84) followed by full-Adam steps
    (eval-action-recg.py:113-185) — train-mode BN throughout
  * linear probe: MOSTModel over two frozen taps, per-tap CE summed into
    one backward (eval-action-recg-linear.py:142-163), classifier-BN in
    train mode, extractor hard-frozen in eval mode

Dropout is disabled in both stacks (use_dropout=False): the two
frameworks cannot share a dropout mask, and the reference's own configs
exercise both settings. Sign/masking/BN-mode bugs this test exists to
catch are dropout-independent.

Loss parity: <1%/step (the BASELINE.md contract). Frozen params: EXACT.
"""

import os
import sys

import jax
import numpy as np
import pytest

jnp = None  # bound in fixtures (import order)

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference not mounted"
)

B, T, H, W = 8, 4, 64, 64
NCLS = 12
LR = 1e-4
WARMUP_STEPS, MAIN_STEPS = 2, 4
PROBE_STEPS = 6


def _one_device_mesh():
    from jax.sharding import Mesh

    from avid_cma_tpu.parallel.mesh import DATA_AXIS

    return Mesh(np.asarray(jax.devices()[:1]), (DATA_AXIS,))


@pytest.fixture()
def ref_path(monkeypatch):
    import torch

    global jnp
    import jax.numpy as jnp_mod

    jnp = jnp_mod
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REFERENCE)
    yield REFERENCE
    sys.path.pop(0)


def _shared_data(seed):
    rng = np.random.default_rng(seed)
    videos = rng.normal(size=(2, B, T, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, NCLS, size=(2, B)).astype(np.int64)
    return videos, labels


def _torch_video_backbone(seed):
    import torch

    from models.video import R2Plus1D as TorchR2P1D

    torch.manual_seed(seed)
    return TorchR2P1D(depth=10)


def _import_backbone_variables(tmodel, tmp_path):
    """torch video-backbone state_dict -> our flax variables, via the
    production .pth.tar importer (keys prefixed as in a full checkpoint).
    Snapshots the CURRENT weights (tensors cloned by torch.save) — call
    BEFORE the torch trajectory mutates them."""
    import torch

    from avid_cma_tpu.train.checkpoint import import_model_pth_tar

    sd = {f"video_model.{k}": v.clone()
          for k, v in tmodel.state_dict().items()}
    path = str(tmp_path / "backbone.pth.tar")
    torch.save({"model": sd}, path)
    full = import_model_pth_tar(path)
    return (full["params"]["video_model"],
            full["batch_stats"].get("video_model", {}))


def _make_state(model, params, batch_stats, tx):
    from avid_cma_tpu.train.state import TrainState

    return TrainState(
        step=jnp.int32(0), epoch=jnp.int32(0), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params), bank=None,
        rng=jax.random.key(0),
    )


def test_finetune_trajectory_parity(ref_path, tmp_path):
    """ClassificationWrapper finetune: warmup-masked steps then full Adam,
    vs reference eval-action-recg.py run_phase('train') math."""
    import torch

    from avid_cma_tpu.models.video import R2Plus1D
    from avid_cma_tpu.models.eval_wrappers import ClassificationWrapper
    from avid_cma_tpu.train.eval_loop import (
        classifier_only_optimizer,
        make_supervised_train_step,
    )
    from avid_cma_tpu.train.optim import build_optimizer

    sys.path.insert(0, REFERENCE)
    try:
        from utils.eval_utils import (
            ClassificationWrapper as TorchClassificationWrapper,
        )

        tbackbone = _torch_video_backbone(0)
        tmodel = TorchClassificationWrapper(
            feature_extractor=tbackbone, n_classes=NCLS, feat_name="pool",
            feat_dim=512, pooling_op=None, use_dropout=False,
        )
        tmodel.train()
    finally:
        sys.path.pop(0)

    videos, labels = _shared_data(0)
    # snapshot ALL initial weights BEFORE the torch trajectory mutates them
    tcls_w = tmodel.classifier.weight.detach().numpy().copy()
    tcls_b = tmodel.classifier.bias.detach().numpy().copy()
    backbone_params, backbone_stats = _import_backbone_variables(
        tbackbone, tmp_path
    )

    # ---------------- torch trajectory ----------------
    crit = torch.nn.CrossEntropyLoss()
    # warmup: fresh Adam over non-feature_extractor params
    # (eval-action-recg.py:77-81), then a fresh full Adam
    warm_opt = torch.optim.Adam(
        [p for n, p in tmodel.named_parameters()
         if "feature_extractor" not in n], lr=LR,
    )
    full_opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    t_losses = []
    for s in range(WARMUP_STEPS + MAIN_STEPS):
        opt = warm_opt if s < WARMUP_STEPS else full_opt
        v = torch.from_numpy(np.transpose(videos[s % 2], (0, 4, 1, 2, 3)))
        y = torch.from_numpy(labels[s % 2])
        logits = tmodel(v)
        loss = crit(logits, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---------------- our trajectory (production step fns) ----------------
    model = ClassificationWrapper(
        feature_extractor=R2Plus1D(depth=10), n_classes=NCLS,
        feat_name="pool", pooling_op=None, use_dropout=False,
    )
    params = {
        "feature_extractor": backbone_params,
        "classifier": {"kernel": jnp.asarray(tcls_w.T),
                       "bias": jnp.asarray(tcls_b)},
    }
    batch_stats = {"feature_extractor": backbone_stats}
    mesh = _one_device_mesh()

    base = build_optimizer("adam", lambda _: LR, weight_decay=0.0)
    warm_tx = classifier_only_optimizer(base, params)
    full_tx = build_optimizer("adam", lambda _: LR, weight_decay=0.0)
    warm_step = make_supervised_train_step(model, warm_tx, mesh)
    full_step = make_supervised_train_step(model, full_tx, mesh)

    state = _make_state(model, params, batch_stats, warm_tx)
    j_losses = []
    stem_before_warmup = np.asarray(
        state.params["feature_extractor"]["conv1"]["kernel"]
    ).copy()
    for s in range(WARMUP_STEPS + MAIN_STEPS):
        if s == WARMUP_STEPS:
            # warmup phase complete: the backbone must not have moved yet
            stem_after_warmup = np.asarray(
                state.params["feature_extractor"]["conv1"]["kernel"]
            ).copy()
            # fresh full optimizer, keep params/stats (the reference
            # swaps optimizers between the warmup and main phases)
            state = state.replace(opt_state=full_tx.init(state.params))
        step_fn = warm_step if s < WARMUP_STEPS else full_step
        frames = jnp.asarray(videos[s % 2])
        y = jnp.asarray(labels[s % 2].astype(np.int32))
        state, metrics, _ = step_fn(state, frames, y)
        j_losses.append(float(metrics["loss"]))
    # warmup really froze the backbone: stem EXACTLY unchanged
    np.testing.assert_array_equal(stem_after_warmup, stem_before_warmup)

    for s, (tj, jj) in enumerate(zip(t_losses, j_losses)):
        assert abs(jj - tj) / abs(tj) < 1e-2, (
            f"step {s}: torch {tj} vs ours {jj} "
            f"({t_losses} vs {j_losses})"
        )

    # final classifier weights agree within the Adam step budget
    n_steps = WARMUP_STEPS + MAIN_STEPS
    np.testing.assert_allclose(
        np.asarray(state.params["classifier"]["kernel"]).T,
        tmodel.classifier.weight.detach().numpy(),
        atol=2 * n_steps * LR,
    )
    # backbone stem moved only during the main phase, identically-ish
    t_stem = tmodel.feature_extractor.conv1[0].weight.detach().numpy()
    j_stem = np.transpose(
        np.asarray(state.params["feature_extractor"]["conv1"]["kernel"]),
        (4, 3, 0, 1, 2),
    )
    np.testing.assert_allclose(j_stem, t_stem, atol=2 * MAIN_STEPS * LR)


def test_linear_probe_trajectory_parity(ref_path, tmp_path):
    """MOSTModel probe: summed per-tap CE, frozen eval-mode extractor,
    train-mode classifier BN, vs eval-action-recg-linear.py run_phase."""
    import torch

    from avid_cma_tpu.models.video import R2Plus1D
    from avid_cma_tpu.models.eval_wrappers import MOSTModel
    from avid_cma_tpu.train.eval_loop import (
        classifier_only_optimizer,
        make_supervised_train_step,
    )
    from avid_cma_tpu.train.optim import build_optimizer

    sys.path.insert(0, REFERENCE)
    try:
        from utils.eval_utils import MOSTModel as TorchMOSTModel

        tbackbone = _torch_video_backbone(2)
        torch.manual_seed(3)
        tmodel = TorchMOSTModel(
            feature_extractor=tbackbone, n_classes=NCLS,
            feat_names=["conv5x", "pool"],
            feat_dims=[512 * 2 * 2, 512],
            pooling_ops=["AdaptiveMaxPool3d((1, 2, 2))", None],
            use_bn=True, use_dropout=False,
        )
        # run_phase sets the WHOLE model to train mode; MOSTModel's
        # extractor was set eval at construction but train(True)
        # re-enables it — except the reference's forward wraps the
        # extractor in no_grad and our MOSTModel pins train=False, so
        # match the reference loop exactly:
        tmodel.train(True)
        tmodel.feature_extractor.train(False)
    finally:
        sys.path.pop(0)

    videos, labels = _shared_data(4)
    # snapshot ALL initial weights BEFORE the torch trajectory mutates them
    backbone_params, backbone_stats = _import_backbone_variables(
        tbackbone, tmp_path
    )
    tcls_init = [
        {
            "bn_scale": c.bn.weight.detach().numpy().copy(),
            "bn_bias": c.bn.bias.detach().numpy().copy(),
            "bn_mean": c.bn.running_mean.numpy().copy(),
            "bn_var": c.bn.running_var.numpy().copy(),
            "w": c.classifier.weight.detach().numpy().copy(),
            "b": c.classifier.bias.detach().numpy().copy(),
        }
        for c in tmodel.classifiers
    ]

    crit = torch.nn.CrossEntropyLoss()
    opt = torch.optim.Adam(tmodel.classifiers.parameters(), lr=LR)
    t_losses = []
    for s in range(PROBE_STEPS):
        v = torch.from_numpy(np.transpose(videos[s % 2], (0, 4, 1, 2, 3)))
        y = torch.from_numpy(labels[s % 2])
        logits = tmodel(v)
        total = sum(crit(logits[ft], y) for ft in ("conv5x", "pool"))
        opt.zero_grad()
        total.backward()
        opt.step()
        t_losses.append(float(total))

    # ---------------- ours ----------------
    model = MOSTModel(
        feature_extractor=R2Plus1D(depth=10), n_classes=NCLS,
        feat_names=["conv5x", "pool"],
        pooling_ops=["AdaptiveMaxPool3d((1, 2, 2))", None],
        use_bn=True, use_dropout=False,
    )
    # initialize classifier heads from torch's (BN starts at identity on
    # both sides; Linear weights copied exactly)
    probe = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, T, H, W, 3)), train=False
        )
    )
    params = {"feature_extractor": backbone_params}
    batch_stats = {"feature_extractor": backbone_stats}
    # feature-vector layout: torch flattens the pooled conv5x tap
    # channel-MAJOR ((B, C, T, H, W).view(B, -1)); ours is channel-LAST
    # ((B, T, H, W, C).reshape(B, -1)) — permute the imported head
    # weights and BN stats accordingly. conv5x @ 64^2 input, pooled
    # (1, 2, 2): C=512, (T, H, W) = (1, 2, 2).
    conv5x_perm = (
        np.arange(512 * 1 * 2 * 2)
        .reshape(512, 1, 2, 2)
        .transpose(1, 2, 3, 0)
        .reshape(-1)
    )
    perms = {"conv5x": conv5x_perm, "pool": np.arange(512)}
    for i, ft in enumerate(("conv5x", "pool")):
        init, perm = tcls_init[i], perms[ft]
        name = f"classifier_{ft}"
        params[name] = {
            "bn": {
                "scale": jnp.asarray(init["bn_scale"][perm]),
                "bias": jnp.asarray(init["bn_bias"][perm]),
            },
            "classifier": {
                "kernel": jnp.asarray(init["w"][:, perm].T),
                "bias": jnp.asarray(init["b"]),
            },
        }
        batch_stats[name] = {"bn": {
            "mean": jnp.asarray(init["bn_mean"][perm]),
            "var": jnp.asarray(init["bn_var"][perm]),
        }}
    # shape-check against the model's own structure (catches key drift)
    jax.tree.map(lambda a, b: None, params, jax.tree.map(
        lambda x: None, probe["params"]))

    mesh = _one_device_mesh()
    base = build_optimizer("adam", lambda _: LR, weight_decay=0.0)
    tx = classifier_only_optimizer(base, params)
    step = make_supervised_train_step(model, tx, mesh, multi_output=True)
    state = _make_state(model, params, batch_stats, tx)

    stem0 = np.asarray(
        state.params["feature_extractor"]["conv1"]["kernel"]
    ).copy()
    # numpy snapshot: the live buffers are donated into the first step
    stats0 = jax.tree.map(
        lambda x: np.asarray(x).copy(), backbone_stats
    )
    j_losses = []
    for s in range(PROBE_STEPS):
        frames = jnp.asarray(videos[s % 2])
        y = jnp.asarray(labels[s % 2].astype(np.int32))
        state, metrics, _ = step(state, frames, y)
        j_losses.append(float(metrics["loss"]))

    for s, (tj, jj) in enumerate(zip(t_losses, j_losses)):
        assert abs(jj - tj) / abs(tj) < 1e-2, (
            f"step {s}: torch {tj} vs ours {jj} "
            f"({t_losses} vs {j_losses})"
        )
    # extractor EXACTLY frozen (params AND its BN running stats: the
    # extractor runs in eval mode on both sides)
    np.testing.assert_array_equal(
        np.asarray(state.params["feature_extractor"]["conv1"]["kernel"]),
        stem0,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        state.batch_stats["feature_extractor"], stats0,
    )
    # classifier BN running stats evolved identically (train-mode BN on
    # the probe heads is part of the contract)
    for i, ft in enumerate(("conv5x", "pool")):
        np.testing.assert_allclose(
            np.asarray(state.batch_stats[f"classifier_{ft}"]["bn"]["mean"]),
            tmodel.classifiers[i].bn.running_mean.numpy()[perms[ft]],
            rtol=1e-4, atol=1e-5,
        )
    # final classifier weights agree within the Adam step budget
    for i, ft in enumerate(("conv5x", "pool")):
        np.testing.assert_allclose(
            np.asarray(
                state.params[f"classifier_{ft}"]["classifier"]["kernel"]
            ).T,
            tmodel.classifiers[i].classifier.weight.detach().numpy()
            [:, perms[ft]],
            atol=2 * PROBE_STEPS * LR,
        )
