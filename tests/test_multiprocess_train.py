"""Multi-process TRAINING: real train steps across a 2-process CPU
rendezvous, checked for numerical equivalence against a single-process
run on the same global data — the proof that multi-host execution is a
working path, not wiring.

Capability reference: multi-node data-parallel training
(main-avid.py:66-78, utils/main_utils.py:18-31, README.md:53-60).

Two layers:
  * test_two_process_train_matches_single_process — 2 workers (2 CPU
    devices each -> one 4-device global mesh) run K fused train steps via
    parallel/multihost.{distribute_tree, global_batch}; the pytest
    process runs the identical program single-process on a 4-device mesh;
    losses, final params and banks must agree.
  * test_two_process_run_pretraining_smoke — the FULL production loop
    (run_pretraining: sharded loaders, CMA mining on global arrays,
    orbax saves from both processes, meter sync) completes under 2
    processes and both report the identical replicated train state.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

STEP_WORKER = r"""
import json, sys
import jax

proc_id, nprocs, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)
assert jax.device_count() == 4 and len(jax.local_devices()) == 2

from tests.mp_train_driver import run_fused_steps

out = run_fused_steps(n_steps=3, global_bs=8)
with open(out_path, "w") as f:
    json.dump(out, f)
"""

LOOP_WORKER = r"""
import json, sys
import jax
import numpy as np

proc_id, nprocs, port, out_path, model_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)

from avid_cma_tpu.config import from_dict
from avid_cma_tpu.train.loop import run_pretraining

cfg = from_dict({
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
        "name": "smoke-mp", "model_dir": model_dir, "arch": "av_wrapper",
        "args": {"proj_dim": [64, 32],
                 "video_backbone": "R2Plus1D",
                 "video_backbone_args": {"depth": 10},
                 "audio_backbone": "Conv2D",
                 "audio_backbone_args": {"depth": 10}},
    },
    "loss": {"name": "AVID_CMA", "bank_sharding": "sharded", "args": {
        "num_data": 16, "num_negatives": 8, "momentum": 0.5,
        "num_negatives_within": 4,
        "xModalInstCoeff": 1.0, "wModalInstCoeff": 0.0,
        "xModalPosCoeff": 0.0, "wModalPosCoeff": 1.0,
        "resample_freq": 1,
        "sampling_args": {"type": "consensus", "pos_k": 2},
    }},
})
state = run_pretraining(cfg, debug=True)

from avid_cma_tpu.parallel.sharding import unshard_bank
from avid_cma_tpu.parallel.mesh import make_mesh

mesh = make_mesh()
v1 = np.asarray(unshard_bank(state.bank.view1_mem, 16, mesh=mesh))
with open(out_path, "w") as f:
    json.dump({
        "step": int(state.step),
        "z": float(state.bank.z),
        "bank_sum": float(np.abs(v1).sum()),
        "pos_rows": int(state.bank.positive_set.shape[0]),
    }, f)
"""


EVAL_WORKER = r"""
import json, sys
import jax
import numpy as np

proc_id, nprocs, port, out_path, model_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)

from avid_cma_tpu.config import from_dict
from avid_cma_tpu.train.eval_loop import run_action_recognition

split = {"split": "trainlist{fold:02d}", "mode": "clip",
         "clips_per_video": 1, "use_augmentation": True,
         "use_shuffle": True, "drop_last": True}
test = {"split": "testlist{fold:02d}", "mode": "clip",
        "clips_per_video": 1, "use_augmentation": False,
        "use_shuffle": False, "drop_last": False}
ecfg = from_dict({
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
        "args": {"n_classes": 101, "feat_name": "pool",
                 "pooling_op": None, "use_dropout": True, "dropout": 0.5},
    },
})
mcfg = from_dict({
    "name": "smoke", "model_dir": model_dir, "arch": "av_wrapper",
    "args": {"proj_dim": [64, 32],
             "video_backbone": "R2Plus1D",
             "video_backbone_args": {"depth": 10},
             "audio_backbone": "Conv2D",
             "audio_backbone_args": {"depth": 10}},
})
results = run_action_recognition(ecfg, mcfg, fold=1, debug=True)
with open(out_path, "w") as f:
    json.dump({k: float(v) for k, v in results.items()}, f)
"""


LINEAR_WORKER = r"""
import json, sys
import jax
import numpy as np

proc_id, nprocs, port, out_path, model_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)

from avid_cma_tpu.config import from_dict
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
        "args": {"n_classes": 101, "feat_names": ["conv5x", "pool"],
                 "pooling_ops": ["AdaptiveMaxPool3d((1, 1, 1))", None],
                 "l2_norm": False, "use_bn": True, "use_dropout": False},
    },
})
mcfg = from_dict({
    "name": "smoke", "model_dir": model_dir, "arch": "av_wrapper",
    "args": {"proj_dim": [64, 32],
             "video_backbone": "R2Plus1D",
             "video_backbone_args": {"depth": 10},
             "audio_backbone": "Conv2D",
             "audio_backbone_args": {"depth": 10}},
})
results = run_linear_probe(ecfg, mcfg, fold=1, debug=True)
with open(out_path, "w") as f:
    json.dump({ft: {k: float(v) for k, v in r.items()}
               for ft, r in results.items()}, f)
"""


MULTI_MANAGER_WORKER = r"""
import json, sys
import jax
import numpy as np

proc_id, nprocs, port, out_path, root = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)

from avid_cma_tpu.train.checkpoint import CheckpointManager

# the eval loop's exact pattern (train/eval_loop.py on_epoch_end):
# several managers, back-to-back ASYNC saves each epoch. Without a
# per-manager barrier namespace orbax's cross-process sync barriers
# collide: FAILED_PRECONDITION "Barrier ...:set_value_start is already
# ongoing" — a real multi-host finetune crash, not test flake.
mgrs = [CheckpointManager(f"{root}/m{i}") for i in range(3)]
state = {"w": np.arange(8, dtype=np.float32), "step": 0}
for step in range(3):
    for m in mgrs:
        m.save(step, {**state, "step": step})
for m in mgrs:
    m.wait_until_finished()
restored = mgrs[1].restore({**state, "step": 0}, step=2)
with open(out_path, "w") as f:
    json.dump({"ok": True, "step": int(restored["step"])}, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(n_local_devices: int) -> dict:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch(worker_src, tmp_path, extra_args=(), n_local_devices=2,
            timeout=900):
    nprocs = 2
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(worker_src)
    env = _worker_env(n_local_devices)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs, outs = [], []
    for pid in range(nprocs):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), str(nprocs),
             str(port), str(out), *extra_args],
            env=env, cwd=repo_root,
        ))
    for p in procs:
        assert p.wait(timeout=timeout) == 0, "worker failed"
    return [json.loads(o.read_text()) for o in outs]


def test_two_process_train_matches_single_process(tmp_path):
    # ground truth: identical program, single process, 4-device mesh
    from tests.mp_train_driver import run_fused_steps

    want = run_fused_steps(n_steps=3, global_bs=8, n_devices=4)

    results = _launch(STEP_WORKER, tmp_path)
    # noise floor: deterministic ~1e-6 rounding differences between any
    # two XLA CPU compilations (measured across single-process device
    # counts); the driver's BN-free model + SGD keep growth linear
    for got in results:
        np.testing.assert_allclose(got["losses"], want["losses"], rtol=1e-4)
        np.testing.assert_allclose(
            got["param_sum"], want["param_sum"], rtol=1e-4
        )
        np.testing.assert_allclose(got["bank_sum"], want["bank_sum"],
                                   rtol=1e-4)
        np.testing.assert_allclose(got["z"], want["z"], rtol=1e-4)
    # the two processes observed the very same replicated state (one
    # SPMD program instance -> exact agreement)
    assert results[0] == results[1]


def test_two_process_run_pretraining_smoke(tmp_path):
    model_dir = tmp_path / "runs"
    model_dir.mkdir()
    results = _launch(LOOP_WORKER, tmp_path, extra_args=(str(model_dir),),
                      timeout=1200)
    for r in results:
        assert r["step"] >= 2
        assert np.isfinite(r["z"])
        assert r["pos_rows"] % 4 == 0  # row-sharded (padded) positive set
    assert results[0] == results[1]
    # orbax checkpoints actually landed (multi-process distributed save)
    ckpt_dir = model_dir / "smoke-mp" / "orbax"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())


def test_two_process_concurrent_multi_manager_saves(tmp_path):
    """Regression: several CheckpointManagers issuing back-to-back ASYNC
    saves under 2 processes must not collide on orbax's cross-process
    barrier keys (each manager gets its own barrier_sync_key_prefix,
    train/checkpoint.py). Without the per-manager namespace this fails
    FAILED_PRECONDITION 'Barrier ... is already ongoing' — the crash the
    eval loop's orbax/orbax_best/orbax_warmup trio hits on real
    multi-host runs."""
    root = tmp_path / "ckpts"
    root.mkdir()
    results = _launch(MULTI_MANAGER_WORKER, tmp_path,
                      extra_args=(str(root),), timeout=600)
    for r in results:
        assert r["ok"] and r["step"] == 2


def test_two_process_finetune_eval_smoke(tmp_path):
    """The FULL finetune-eval loop (warmup mask, per-epoch clip test,
    best-checkpoint tracking, 25-clip + chunk-batched dense eval) under 2
    processes: sharded loaders, lockstep logits dispatches, cross-process
    count sync. Both processes must report the identical (globally
    reduced) metrics. Reference: distributed eval loaders + meter sync,
    utils/eval_utils.py:53-142."""
    model_dir = tmp_path / "runs"
    model_dir.mkdir()
    results = _launch(EVAL_WORKER, tmp_path, extra_args=(str(model_dir),),
                      timeout=1200)
    for r in results:
        for k in ("clip@1", "clip@5", "video@1", "video@5"):
            assert k in r and np.isfinite(r[k]) and 0.0 <= r[k] <= 100.0
    assert results[0] == results[1]


def test_two_process_linear_probe_smoke(tmp_path):
    """The multi-tap linear probe (frozen extractor, per-tap probes,
    summed losses, per-tap clip metrics) under 2 processes: sharded
    loaders + per-tap cross-process count sync. Both processes must
    report the identical globally-reduced per-tap metrics. Reference:
    eval-action-recg-linear.py + utils/eval_utils.py:53-142."""
    model_dir = tmp_path / "runs"
    model_dir.mkdir()
    results = _launch(LINEAR_WORKER, tmp_path, extra_args=(str(model_dir),),
                      timeout=1200)
    for r in results:
        for ft in ("conv5x", "pool"):
            assert ft in r and np.isfinite(r[ft]["clip@1"])
            assert 0.0 <= r[ft]["clip@1"] <= 100.0
    assert results[0] == results[1]
