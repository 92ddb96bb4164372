"""Integration tests for the eval orchestration (reference flows:
eval-action-recg.py, eval-action-recg-linear.py) on synthetic data:
per-epoch test phases, best-checkpoint tracking, and restore reproducing
metrics (reference: eval-action-recg.py:83-98 + utils/main_utils.py:318-323)."""

import json
import os

import numpy as np

from avid_cma_tpu.config import from_dict


def model_cfg(tmp_path):
    return from_dict({
        "name": "smoke", "model_dir": str(tmp_path),
        "arch": "av_wrapper",
        "args": {"proj_dim": [64, 32],
                 "video_backbone": "R2Plus1D",
                 "video_backbone_args": {"depth": 10},
                 "audio_backbone": "Conv2D",
                 "audio_backbone_args": {"depth": 10}},
    })


def finetune_cfg(n_classes=101):
    split = {"split": "trainlist{fold:02d}", "mode": "clip",
             "clips_per_video": 1, "use_augmentation": True,
             "use_shuffle": True, "drop_last": True}
    test = {"split": "testlist{fold:02d}", "mode": "clip",
            "clips_per_video": 1, "use_augmentation": False,
            "use_shuffle": False, "drop_last": False}
    return from_dict({
        "seed": 0, "num_workers": 1, "test_only": False, "resume": False,
        "benchmark": {"name": "ucf-smoke"},
        "dataset": {
            "name": "ucf101", "backend": "synthetic", "synthetic_size": 16,
            "fold": 1, "batch_size": 8, "clip_duration": 0.25,
            "video_fps": 8.0, "crop_size": 32,
            "train": split, "test": test,
            "test_dense": {**test, "mode": "video", "clips_per_video": 2},
        },
        "optimizer": {
            "name": "adam", "num_epochs": 1, "weight_decay": 0.0,
            "warmup_classifier": True, "warmup_epochs": 1,
            "lr": {"name": "multistep", "base_lr": 1e-3, "gamma": 1.0,
                   "milestones": [1]},
        },
        "model": {
            "name": "ClassificationWrapper",
            "args": {"n_classes": n_classes, "feat_name": "pool",
                     "pooling_op": None, "use_dropout": True, "dropout": 0.5},
        },
    })


def test_finetune_best_checkpoint_and_restore(tmp_path):
    from avid_cma_tpu.train.eval_loop import run_action_recognition

    ecfg = finetune_cfg()
    mcfg = model_cfg(tmp_path)
    results = run_action_recognition(ecfg, mcfg, fold=1, debug=True)
    for k in ("clip@1", "clip@5", "video@1", "video@5"):
        assert k in results and np.isfinite(results[k])

    eval_dir = os.path.join(
        str(tmp_path), "smoke", "eval-ucf-smoke", "fold-01"
    )
    # per-epoch saves + best tracking (reference model_best.pth.tar)
    best_path = os.path.join(eval_dir, "best.json")
    assert os.path.isfile(best_path), "best checkpoint metadata missing"
    best = json.load(open(best_path))
    assert best["step"] >= 0 and best["top1"] >= 0.0
    assert os.path.isdir(os.path.join(eval_dir, "orbax_best"))

    # restore (test_only) must reproduce the final metrics exactly: same
    # params, deterministic eval preprocessing
    ecfg2 = finetune_cfg()
    ecfg2["test_only"] = True
    results2 = run_action_recognition(ecfg2, mcfg, fold=1, debug=True)
    np.testing.assert_allclose(results2["clip@1"], results["clip@1"])
    np.testing.assert_allclose(results2["video@1"], results["video@1"])


def test_finetune_warmup_checkpoint_and_resume(tmp_path):
    """The classifier-warmup phase checkpoints per epoch (orbax_warmup)
    and a preemption before the first finetune save resumes from the
    warmup checkpoint instead of restarting the warmup from scratch."""
    import shutil

    from avid_cma_tpu.train.eval_loop import run_action_recognition

    ecfg = finetune_cfg()
    mcfg = model_cfg(tmp_path)
    run_action_recognition(ecfg, mcfg, fold=1, debug=True)
    eval_dir = os.path.join(
        str(tmp_path), "smoke", "eval-ucf-smoke", "fold-01"
    )
    warm_dir = os.path.join(eval_dir, "orbax_warmup")
    assert os.path.isdir(warm_dir) and os.listdir(warm_dir)
    from avid_cma_tpu.train.checkpoint import CheckpointManager

    warm_step_before = CheckpointManager(warm_dir).latest_step()

    # simulate preemption after warmup but before any finetune save
    shutil.rmtree(os.path.join(eval_dir, "orbax"))
    ecfg2 = finetune_cfg()
    ecfg2["resume"] = True
    results = run_action_recognition(ecfg2, mcfg, fold=1, debug=True)
    assert np.isfinite(results["clip@1"])
    # the restored warmup state was at its final epoch: the warmup loop
    # must NOT have rerun — its checkpoint step is UNCHANGED (a rerun
    # would save a later step), and the log records the restore
    log = open(os.path.join(eval_dir, "eval.log")).read()
    assert "restored warmup checkpoint" in log
    assert CheckpointManager(warm_dir).latest_step() == warm_step_before


def test_linear_probe_multi_tap(tmp_path):
    from avid_cma_tpu.train.eval_loop import run_linear_probe

    split = {"split": "trainlist{fold:02d}", "mode": "clip",
             "clips_per_video": 1, "use_augmentation": True,
             "use_shuffle": True, "drop_last": True}
    test = {"split": "testlist{fold:02d}", "mode": "clip",
            "clips_per_video": 1, "use_augmentation": False,
            "use_shuffle": False, "drop_last": False}
    ecfg = from_dict({
        "seed": 0, "num_workers": 1, "test_only": False, "resume": False,
        "benchmark": {"name": "probe-smoke"},
        "dataset": {
            "name": "ucf101", "backend": "synthetic", "synthetic_size": 16,
            "fold": 1, "batch_size": 8, "clip_duration": 0.25,
            "video_fps": 8.0, "crop_size": 32,
            "train": split, "test": test,
        },
        "optimizer": {
            "name": "adam", "num_epochs": 1, "weight_decay": 0.0,
            "lr": {"name": "multistep", "base_lr": 1e-3, "gamma": 1.0,
                   "milestones": [1]},
        },
        "model": {
            "name": "MOST",
            "args": {"n_classes": 101,
                     "feat_names": ["conv5x", "pool"],
                     "pooling_ops": ["AdaptiveMaxPool3d((1, 1, 1))", None],
                     "l2_norm": False, "use_bn": True, "use_dropout": False},
        },
    })
    results = run_linear_probe(ecfg, model_cfg(tmp_path), fold=1, debug=True)
    for ft in ("conv5x", "pool"):
        assert "clip@1" in results[ft] and np.isfinite(results[ft]["clip@1"])


def test_warmup_optimizer_freezes_backbone():
    """The classifier-only warmup must leave feature_extractor params
    bit-identical after a step with NONZERO backbone gradients —
    optax.masked would have passed the raw gradient through and
    apply_updates would ADD it (unscaled ascent on the pretrained
    backbone); regression for the classifier_only_optimizer fix."""
    import jax
    import jax.numpy as jnp
    import optax

    from avid_cma_tpu.models.eval_wrappers import ClassificationWrapper
    from avid_cma_tpu.models.video import R2Plus1D
    from avid_cma_tpu.parallel.mesh import make_mesh
    from avid_cma_tpu.train.eval_loop import (
        classifier_only_optimizer,
        make_supervised_train_step,
    )
    from avid_cma_tpu.train.state import TrainState

    model = ClassificationWrapper(
        feature_extractor=R2Plus1D(depth=10), n_classes=5, feat_name="pool"
    )
    # 2 samples per device: the head's BatchNorm zeroes its features at
    # per-device batch 1 (x - mean(x) == 0), which would zero the head
    # grads and make the 'head trained' assertion vacuous
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 4, 32, 32, 3)), jnp.float32
    )
    labels = jnp.asarray([1, 3, 0, 4, 2, 1, 3, 0] * 2, jnp.int32)
    variables = model.init(jax.random.key(0), frames, train=False)
    opt = classifier_only_optimizer(optax.adam(1e-2), variables["params"])
    state = TrainState(
        step=jnp.int32(0), epoch=jnp.int32(0), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]), bank=None,
        rng=jax.random.key(0),
    )
    # copy=True: the step donates its input buffers, and a zero-copy
    # np.asarray view on CPU would alias the in-place-updated memory,
    # making both assertions vacuous
    before = jax.tree.map(
        lambda a: np.array(a, copy=True), state.params["feature_extractor"]
    )
    head_before = np.array(state.params["classifier"]["kernel"], copy=True)
    step = make_supervised_train_step(model, opt, make_mesh())
    state, m, _ = step(state, frames, labels)
    after = state.params["feature_extractor"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        after, before,
    )
    # and the head DID train
    assert not np.array_equal(
        np.asarray(state.params["classifier"]["kernel"]), head_before
    )


def test_linear_probe_kinetics_crop_color_route(tmp_path):
    """The Kinetics linear-probe recipe (transform: crop+color,
    configs/benchmark/kinetics/8x224x224-linear.yaml) must execute the
    VideoPrep_Crop_CJ train branch — the path that was silently replaced
    by MSC cropping for four rounds. Pins both the routing (the Crop_CJ
    device function is traced) and the end-to-end run."""
    from avid_cma_tpu.data import pipelines
    from avid_cma_tpu.train.eval_loop import run_linear_probe

    split = {"split": "train", "mode": "clip", "clips_per_video": 1,
             "use_augmentation": True, "use_shuffle": True,
             "drop_last": True}
    test = {"split": "val", "mode": "clip", "clips_per_video": 1,
            "use_augmentation": False, "use_shuffle": False,
            "drop_last": False}
    ecfg = from_dict({
        "seed": 0, "num_workers": 1, "test_only": False, "resume": False,
        "benchmark": {"name": "kin-probe-smoke"},
        "dataset": {
            "name": "kinetics", "backend": "synthetic",
            "synthetic_size": 16, "batch_size": 8, "clip_duration": 0.25,
            "video_fps": 8.0, "crop_size": 32, "resize": 40,
            "transform": "crop+color",
            "train": split, "test": test,
        },
        "optimizer": {
            "name": "adam", "num_epochs": 1, "weight_decay": 0.0,
            "lr": {"name": "multistep", "base_lr": 1e-3, "gamma": 1.0,
                   "milestones": [1]},
        },
        "model": {
            "name": "MOST",
            "args": {"n_classes": 400, "feat_names": ["pool"],
                     "pooling_ops": [None], "l2_norm": False,
                     "use_bn": True, "use_dropout": False},
        },
    })
    traced = {"train": 0, "eval": 0}
    orig_train = pipelines.crop_augment_clips_train
    orig_eval = pipelines.crop_augment_clips_eval

    def spy_train(*a, **k):
        traced["train"] += 1
        return orig_train(*a, **k)

    def spy_eval(*a, **k):
        traced["eval"] += 1
        return orig_eval(*a, **k)

    pipelines.crop_augment_clips_train = spy_train
    pipelines.crop_augment_clips_eval = spy_eval
    try:
        results = run_linear_probe(ecfg, model_cfg(tmp_path), fold=1,
                                   debug=True)
    finally:
        pipelines.crop_augment_clips_train = orig_train
        pipelines.crop_augment_clips_eval = orig_eval
    assert traced["train"] >= 1, "Crop_CJ train branch never traced"
    assert traced["eval"] >= 1, "Crop_CJ eval branch never traced"
    assert "clip@1" in results["pool"]
    assert np.isfinite(results["pool"]["clip@1"])
