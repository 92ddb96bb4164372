"""Integration smoke tests for the orchestration loops on the CPU mesh
(reference flows: main-avid.py, eval-action-recg.py, eval-action-recg-
linear.py) — synthetic data end to end, incl. test phase and resume."""

import jax
import numpy as np
import pytest

from avid_cma_tpu.config import from_dict


def pretrain_cfg(tmp_path, loss_name="AVID"):
    loss_args = {
        "num_data": 16, "num_negatives": 8, "momentum": 0.5,
        "xModal_coeff": 1.0, "wModal_coeff": 0.0,
    }
    if loss_name == "AVID_CMA":
        loss_args = {
            "num_data": 16, "num_negatives": 8, "momentum": 0.5,
            "num_negatives_within": 4,
            "xModalInstCoeff": 1.0, "wModalInstCoeff": 0.0,
            "xModalPosCoeff": 0.0, "wModalPosCoeff": 1.0,
            "resample_freq": 1,
            "sampling_args": {"type": "consensus", "pos_k": 2},
        }
    return from_dict({
        "seed": 0, "num_workers": 1, "print_freq": 1, "log2tb": False,
        "resume": False, "test_freq": 1,
        "dataset": {
            "name": "kinetics", "backend": "synthetic", "synthetic_size": 16,
            "batch_size": 8, "video_clip_duration": 0.25, "video_fps": 8.0,
            "crop_size": 32, "audio_clip_duration": 0.5, "audio_fps": 24000,
            "spectrogram_fps": 100.0, "n_fft": 512,
            "train": {"split": "train", "use_augmentation": True,
                      "drop_last": True, "clips_per_video": 1},
            "test": {"split": "val", "use_augmentation": False,
                     "drop_last": True, "clips_per_video": 1},
        },
        "optimizer": {
            "name": "adam", "weight_decay": 1e-5, "num_epochs": 1,
            "lr": {"name": "multistep", "base_lr": 2e-4, "gamma": 1.0,
                   "milestones": [1]},
        },
        "model": {
            "name": "smoke", "model_dir": str(tmp_path),
            "arch": "av_wrapper",
            "args": {"proj_dim": [64, 32],
                     "video_backbone": "R2Plus1D",
                     "video_backbone_args": {"depth": 10},
                     "audio_backbone": "Conv2D",
                     "audio_backbone_args": {"depth": 10}},
        },
        "loss": {"name": loss_name, "args": loss_args},
    })


def test_run_pretraining_avid_with_test_phase_and_resume(tmp_path):
    from avid_cma_tpu.train.loop import run_pretraining

    cfg = pretrain_cfg(tmp_path)
    cfg["profile_steps"] = [1, 2]  # XLA trace window (observability)
    state = run_pretraining(cfg, debug=True)
    assert int(state.step) >= 2
    assert float(state.bank.z) > 0
    import glob as _glob

    assert _glob.glob(str(tmp_path / "smoke" / "profile" / "**" / "*"),
                      recursive=True), "no profiler trace captured"

    # resume from the saved checkpoint: no retraining of done epochs
    cfg2 = pretrain_cfg(tmp_path)
    cfg2["resume"] = True
    state2 = run_pretraining(cfg2, debug=True)
    assert int(state2.step) == int(state.step)  # epochs already complete
    np.testing.assert_allclose(
        np.asarray(state2.bank.view1_mem), np.asarray(state.bank.view1_mem),
        rtol=1e-6,
    )


def test_run_pretraining_cma_resamples(tmp_path):
    from avid_cma_tpu.train.loop import run_pretraining

    cfg = pretrain_cfg(tmp_path, loss_name="AVID_CMA")
    state = run_pretraining(cfg, debug=True)
    assert state.bank.positive_set.shape == (16, 2)
    assert np.isfinite(float(state.bank.z))


def test_run_pretraining_cma_sharded_bank_and_resume(tmp_path):
    """AVID-CMA end-to-end with `loss.bank_sharding: sharded` (row-sharded
    banks + positive set over the mesh), including an orbax resume of the
    sharded state. Capability: SURVEY §2.3 memory-axis sharding; the
    reference replicates banks per GPU (criterions/avid.py:88-101)."""
    from avid_cma_tpu.train.loop import run_pretraining

    cfg = pretrain_cfg(tmp_path, loss_name="AVID_CMA")
    cfg.loss["bank_sharding"] = "sharded"
    state = run_pretraining(cfg, debug=True)
    n_dev = jax.device_count()
    assert state.bank.view1_mem.shape[0] % n_dev == 0
    assert state.bank.positive_set.shape[1] == 2
    assert np.isfinite(float(state.bank.z))

    cfg2 = pretrain_cfg(tmp_path, loss_name="AVID_CMA")
    cfg2.loss["bank_sharding"] = "sharded"
    cfg2["resume"] = True
    state2 = run_pretraining(cfg2, debug=True)
    assert int(state2.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(state2.bank.view1_mem), np.asarray(state.bank.view1_mem),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(state2.bank.positive_set), np.asarray(state.bank.positive_set)
    )


@pytest.mark.parametrize("cfg_path,loss_name", [
    ("configs/main/avid/audioset/Cross-N1024.yaml", "AVID"),
    ("configs/main/avid-cma/audioset/InstX-N1024-PosW-N64-Top32.yaml",
     "AVID_CMA"),
])
def test_audioset_flagship_configs_engage_scale_features(
    tmp_path, cfg_path, loss_name
):
    """The AudioSet-2M recipes must ship with their scale features ON:
    `loss.bank_sharding: sharded` (row-sharded banks; replicating 1.78M x
    128 banks per device is the reference's memory wall,
    criterions/avid.py:88-101) and, for CMA, `sampling_args.exact: false`
    (approx_max_k sweep; the exact O(N^2 D) sweep is hours at 1.78M rows).
    Loads the EXACT shipped YAMLs — only test-sizing keys overridden —
    and runs them end to end on the synthetic backend."""
    import os

    from avid_cma_tpu import config as config_lib
    from avid_cma_tpu.train import builders
    from avid_cma_tpu.train.loop import run_pretraining

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = config_lib.load(os.path.join(repo, cfg_path), overrides=[
        # test sizing only — the scale features come from the YAML itself
        "dataset.backend=synthetic",
        "dataset.synthetic_size=64",
        "dataset.crop_size=32",
        "dataset.video_clip_duration=0.25",
        "dataset.video_fps=8.0",
        "dataset.audio_clip_duration=0.5",
        f"model.model_dir={tmp_path}",
        "log2tb=false",
    ])
    # the shipped YAML carries the flags (not injected by the overrides)
    assert cfg.loss.bank_sharding == "sharded"
    crit_cfg = builders.build_criterion_config(cfg.loss)
    if loss_name == "AVID_CMA":
        assert crit_cfg.mining_exact is False  # approx_max_k sweep engaged
        assert crit_cfg.pos_k == 32

    state = run_pretraining(cfg, debug=True)
    n_dev = jax.device_count()
    # banks actually row-sharded over the mesh (padded to a device multiple)
    assert state.bank.view1_mem.shape[0] % n_dev == 0
    spec = state.bank.view1_mem.sharding.spec
    assert spec and spec[0] is not None, f"bank not row-sharded: {spec}"
    if loss_name == "AVID_CMA":
        assert state.bank.positive_set.sharding.spec[0] is not None
    assert np.isfinite(float(state.bank.z))


def test_cma_warmstart_from_framework_avid_run(tmp_path):
    """Torch-free CMA init: run_pretraining(AVID) then run_pretraining(
    AVID_CMA) consuming the AVID run's orbax output directly (reference
    capability: criterions/avid_cma.py:308-319 restores from .pth.tar)."""
    from avid_cma_tpu.train.loop import run_pretraining

    avid_cfg = pretrain_cfg(tmp_path)
    avid_state = run_pretraining(avid_cfg, debug=True)

    cma_cfg = pretrain_cfg(tmp_path, loss_name="AVID_CMA")
    cma_cfg.model["name"] = "smoke-cma"
    cma_cfg.loss["args"]["checkpoint"] = str(tmp_path / "smoke")
    # model weights warm-start from the same orbax run (torch-free chain
    # on the model side too, configs/smoke/avid-cma-synthetic.yaml)
    cma_cfg.model["args"]["checkpoint"] = str(tmp_path / "smoke")
    cma_state = run_pretraining(cma_cfg, debug=True)
    # CMA inherited the AVID run's frozen partition function (banks move
    # during CMA training; Z stays frozen once estimated)
    np.testing.assert_allclose(
        float(cma_state.bank.z), float(avid_state.bank.z), rtol=1e-6
    )


def test_cma_warmstart_trims_sharded_bank_padding(tmp_path):
    """Warm-starting from a SHARDED AVID run whose bank rows were padded
    to a mesh multiple must trim back to num_data (loop._init_bank):
    replicated-mode CMA mining must never rank the zero pad rows into
    positive sets, and re-padding must match THIS run's device count."""
    from avid_cma_tpu.train.loop import run_pretraining

    avid_cfg = pretrain_cfg(tmp_path)
    avid_cfg.loss["bank_sharding"] = "sharded"
    avid_cfg.dataset["synthetic_size"] = 28       # pads 28 -> 32 on 8 dev
    avid_cfg.loss["args"]["num_data"] = 28
    state = run_pretraining(avid_cfg, debug=True)
    n_dev = jax.device_count()
    assert state.bank.view1_mem.shape[0] == -(-28 // n_dev) * n_dev

    cma_cfg = pretrain_cfg(tmp_path, loss_name="AVID_CMA")
    cma_cfg.model["name"] = "smoke-cma-trim"
    cma_cfg.dataset["synthetic_size"] = 28
    cma_cfg.loss["args"]["num_data"] = 28
    cma_cfg.loss["args"]["checkpoint"] = str(tmp_path / "smoke")
    cma_state = run_pretraining(cma_cfg, debug=True)  # replicated banks
    assert cma_state.bank.view1_mem.shape[0] == 28
    assert cma_state.bank.positive_set.shape[0] == 28
    # mined positives index only real rows, never the source run's pad
    assert int(np.max(np.asarray(cma_state.bank.positive_set))) < 28


def test_mid_epoch_resume_skips_trained_batches(tmp_path):
    """A mid-epoch checkpoint must resume INSIDE the epoch: the loop
    fast-forwards past already-trained batches instead of re-training
    them (which would drift the step count against the LR schedule)."""
    import os
    import shutil

    from avid_cma_tpu.train.loop import run_pretraining

    cfg = pretrain_cfg(tmp_path)
    cfg["save_freq_steps"] = 1   # checkpoint after every step
    cfg["no_test"] = True
    cfg.dataset["batch_size"] = 8  # 16 items -> 2 batches/epoch
    state = run_pretraining(cfg, debug=False)  # skip logic is prod-only
    assert int(state.step) == 2

    # simulate preemption after step 1: drop the epoch-end checkpoint
    orbax_dir = str(tmp_path / "smoke" / "orbax")
    assert os.path.isdir(os.path.join(orbax_dir, "2"))
    shutil.rmtree(os.path.join(orbax_dir, "2"))

    cfg2 = pretrain_cfg(tmp_path)
    cfg2["save_freq_steps"] = 1
    cfg2["no_test"] = True
    cfg2.dataset["batch_size"] = 8
    cfg2["resume"] = True
    state2 = run_pretraining(cfg2, debug=False)
    assert int(state2.step) == 2  # finished the epoch, no double-training
    log = open(str(tmp_path / "smoke" / "train.log")).read()
    assert "skipping 1 already-trained batches" in log


def test_import_model_orbax_roundtrip(tmp_path):
    """import_model_orbax returns the params/batch_stats a framework
    pretrain run saved (the model half of the torch-free chain)."""
    from avid_cma_tpu.train.checkpoint import import_model_orbax
    from avid_cma_tpu.train.loop import run_pretraining

    cfg = pretrain_cfg(tmp_path)
    state = run_pretraining(cfg, debug=True)
    variables = import_model_orbax(str(tmp_path / "smoke"))
    got = jax.tree_util.tree_leaves(variables["params"])
    want = jax.tree_util.tree_leaves(state.params)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_run_pretraining_with_native_loader(tmp_path):
    """The production combination the C++ ring was built for: fork
    workers + shm ring + the jitted fused step + orbax saves in one
    run_pretraining (reference analogue: DataLoader worker processes
    feeding DDP training, utils/main_utils.py:214-228)."""
    import pytest

    from avid_cma_tpu import native
    from avid_cma_tpu.train.loop import run_pretraining

    if not native.available():
        pytest.skip("native toolchain unavailable")

    cfg = pretrain_cfg(tmp_path)
    cfg["loader"] = "native"
    cfg.model["name"] = "smoke-native"
    state = run_pretraining(cfg, debug=True)
    assert int(state.step) >= 2
    assert float(state.bank.z) > 0
    import os

    assert os.path.isdir(str(tmp_path / "smoke-native" / "orbax"))
