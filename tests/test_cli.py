"""End-to-end subprocess tests for the three CLI entry points.

The loop functions are covered in-process by test_loops/test_eval_loops;
these run the actual CLIs (`python main_avid.py ...`) so the argparse ->
config-load -> override -> loop seam is executed exactly as a user would
(reference CLIs: main-avid.py:24-45, eval-action-recg.py:29-44,
eval-action-recg-linear.py:29-45).

Subprocesses inherit JAX_PLATFORMS=cpu from conftest; the persistent
compile cache is passed via env so repeated runs stay fast.
"""

import glob
import os
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, timeout=1200):
    # JAX_PLATFORMS=cpu, the virtual-device XLA flag, and the keyed
    # persistent compile cache are inherited from conftest's os.environ
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable] + argv, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def _model_yaml(tmp_path, name="cli-smoke"):
    """Tiny pretrain config (full reference schema) written to disk."""
    cfg = {
        "seed": 0, "num_workers": 1, "print_freq": 1, "log2tb": False,
        "resume": False,
        "dataset": {
            "name": "kinetics", "backend": "synthetic", "synthetic_size": 16,
            "batch_size": 8, "video_clip_duration": 0.25, "video_fps": 16.0,
            "crop_size": 32, "audio_clip_duration": 0.5, "audio_fps": 24000.0,
            "spectrogram_fps": 100.0, "n_fft": 512,
            "train": {"split": "train", "use_augmentation": True,
                      "drop_last": True, "clips_per_video": 1},
        },
        "optimizer": {
            "name": "adam", "weight_decay": 1e-5, "num_epochs": 2,
            "lr": {"name": "multistep", "base_lr": 2e-4, "gamma": 1.0,
                   "milestones": [1]},
        },
        "model": {
            "name": name, "model_dir": str(tmp_path),
            "arch": "av_wrapper",
            "args": {"proj_dim": [64, 32],
                     "video_backbone": "R2Plus1D",
                     "video_backbone_args": {"depth": 10},
                     "audio_backbone": "Conv2D",
                     "audio_backbone_args": {"depth": 10}},
        },
        "loss": {
            "name": "AVID",
            "args": {"num_data": 16, "num_negatives": 8, "momentum": 0.5,
                     "xModal_coeff": 1.0, "wModal_coeff": 0.0},
        },
    }
    path = os.path.join(str(tmp_path), "model.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_main_avid_cli(tmp_path):
    """`python main_avid.py <cfg> --debug --set k=v` trains and checkpoints."""
    cfg_path = _model_yaml(tmp_path)
    r = _run(["main_avid.py", cfg_path, "--debug", "--seed", "3",
              "--set", "model.name=cli-override"])
    assert r.returncode == 0, r.stderr[-4000:]
    # --set reached the loop: run dir uses the overridden name
    run_dir = os.path.join(str(tmp_path), "cli-override")
    assert os.path.isdir(run_dir), r.stdout[-2000:]
    assert glob.glob(os.path.join(run_dir, "orbax", "*")), (
        "no orbax checkpoint written")
    assert os.path.isfile(os.path.join(run_dir, "train.log"))
    # --seed overrode the config seed (reference main-avid.py:37)
    with open(os.path.join(run_dir, "train.log")) as f:
        assert "seed=3" in f.read()
    # resolved config dumped for scripts/checkpoints.py export
    assert os.path.isfile(os.path.join(run_dir, "config.yaml"))


def test_main_avid_cli_flags_parse():
    """--quiet/--seed parse (reference main-avid.py:27,37); no training."""
    import main_avid

    old = sys.argv
    try:
        sys.argv = ["main_avid.py", "cfg.yaml", "--quiet", "--seed", "11"]
        args = main_avid.parse_args()
    finally:
        sys.argv = old
    assert args.quiet and args.seed == 11


def test_eval_action_recg_cli(tmp_path):
    """Finetune eval CLI end-to-end on synthetic UCF (random-init backbone)."""
    model_path = _model_yaml(tmp_path)
    split = {"split": "trainlist{fold:02d}", "mode": "clip",
             "clips_per_video": 1, "use_augmentation": True,
             "use_shuffle": True, "drop_last": True}
    test = {"split": "testlist{fold:02d}", "mode": "clip",
            "clips_per_video": 1, "use_augmentation": False,
            "use_shuffle": False, "drop_last": False}
    ecfg = {
        "seed": 0, "num_workers": 1, "test_only": False, "resume": False,
        "benchmark": {"name": "ucf-cli-smoke"},
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
            "args": {"n_classes": 101, "feat_name": "pool",
                     "pooling_op": None, "use_dropout": True,
                     "dropout": 0.5},
        },
    }
    eval_path = os.path.join(str(tmp_path), "eval.yaml")
    with open(eval_path, "w") as f:
        yaml.safe_dump(ecfg, f)
    r = _run(["eval_action_recg.py", eval_path, model_path,
              "--fold", "1", "--debug", "--quiet"])
    assert r.returncode == 0, r.stderr[-4000:]
    assert "clip@1" in r.stdout, r.stdout[-2000:]
    eval_dir = os.path.join(
        str(tmp_path), "cli-smoke", "eval-ucf-cli-smoke", "fold-01")
    assert os.path.isdir(eval_dir), "eval dir not created"


def test_eval_action_recg_linear_cli(tmp_path):
    """Linear-probe CLI: fold loop + multi-tap output."""
    model_path = _model_yaml(tmp_path)
    split = {"split": "trainlist{fold:02d}", "mode": "clip",
             "clips_per_video": 1, "use_augmentation": True,
             "use_shuffle": True, "drop_last": True}
    test = {"split": "testlist{fold:02d}", "mode": "clip",
            "clips_per_video": 1, "use_augmentation": False,
            "use_shuffle": False, "drop_last": False}
    ecfg = {
        "seed": 0, "num_workers": 1, "test_only": False, "resume": False,
        "benchmark": {"name": "probe-cli-smoke"},
        "dataset": {
            "name": "ucf101", "backend": "synthetic", "synthetic_size": 16,
            "fold": 1, "num_folds": 1, "batch_size": 8,
            "clip_duration": 0.25, "video_fps": 8.0, "crop_size": 32,
            "train": split, "test": test,
        },
        "optimizer": {
            "name": "adam", "num_epochs": 1, "weight_decay": 0.0,
            "lr": {"name": "multistep", "base_lr": 1e-3, "gamma": 1.0,
                   "milestones": [1]},
        },
        "model": {
            "name": "MOST",
            "args": {"n_classes": 101, "feat_names": ["pool"],
                     "pooling_ops": [None], "l2_norm": False,
                     "use_bn": True, "use_dropout": False},
        },
    }
    eval_path = os.path.join(str(tmp_path), "eval_linear.yaml")
    with open(eval_path, "w") as f:
        yaml.safe_dump(ecfg, f)
    r = _run(["eval_action_recg_linear.py", eval_path, model_path,
              "--debug", "--quiet"])
    assert r.returncode == 0, r.stderr[-4000:]
    assert "fold 1:" in r.stdout, r.stdout[-2000:]
