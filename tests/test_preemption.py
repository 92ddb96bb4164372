"""Preemption: SIGKILL a pretraining process mid-run, then resume.

TPU preemption is routine; the reference has no preemption handling
(SURVEY §5: manual per-epoch `resume: true` only). This proves the
framework's claim end-to-end at the PROCESS level: a hard kill — which
may land in the middle of an async orbax write (checkpoint.py saves are
async by default) — leaves only committed steps visible to
`latest_step()`, and a relaunch with `resume: true` continues from the
last committed step to the configured end instead of restarting.
"""

import glob
import os
import re
import signal
import subprocess
import sys
import time

import yaml

from test_cli import REPO, _model_yaml


def _launch(cfg_path, log_path):
    """Spawn the pretrain CLI with stdout/stderr to a FILE.

    A pipe here deadlocks the test: the parent only reads the pipe after
    the first committed checkpoint, but compile-cache load warnings can
    fill the 64 KB pipe buffer first, blocking the child's main thread in
    write() before it ever trains (observed: round-3's reproducible
    failure — the child sat in anon_pipe_write for the full 1200 s
    deadline). The child inherits JAX_PLATFORMS=cpu + the virtual-device
    XLA flag + the keyed compile cache from conftest's os.environ, but
    pin them explicitly so the test does not depend on import order.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    logf = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, "main_avid.py", cfg_path], cwd=REPO, env=env,
        stdout=logf, stderr=subprocess.STDOUT,
    )
    proc._logf = logf  # closed by the caller after wait
    return proc


def _committed_steps(run_dir):
    return sorted(
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(run_dir, "orbax", "[0-9]*"))
        if os.path.basename(p).isdigit()
    )


def test_sigkill_then_resume_completes(tmp_path):
    cfg_path = _model_yaml(tmp_path, name="preempt")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    # every step saved (preemption-safe mid-epoch checkpointing) and
    # enough epochs that the kill lands mid-run: 16 items / batch 8 =
    # 2 steps/epoch x 4 epochs = 8 steps
    cfg["save_freq_steps"] = 1
    cfg["resume"] = True
    cfg["optimizer"]["num_epochs"] = 4
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir = os.path.join(str(tmp_path), "preempt")

    proc = _launch(cfg_path, tmp_path / "leg1.log")
    try:
        # wait for the first COMMITTED checkpoint, then hard-kill — the
        # kill may land inside a later in-flight async write
        deadline = time.time() + 1200
        while time.time() < deadline:
            if _committed_steps(run_dir):
                break
            if proc.poll() is not None:
                break
            time.sleep(0.05)
        preempted = proc.poll() is None
        if preempted:
            proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc._logf.close()
    err = (tmp_path / "leg1.log").read_text()

    steps_after_kill = _committed_steps(run_dir)
    assert steps_after_kill, (
        f"no committed checkpoint before kill/exit; output: {err[-3000:]}"
    )
    if not preempted:
        # process finished before we could kill it (very fast host) —
        # the resume leg below still must be a clean no-op continuation
        assert proc.returncode == 0, err[-3000:]

    # relaunch: resume from the last committed step and run to the end
    # (capture_output reads the pipes concurrently — no deadlock here)
    r = subprocess.run(
        [sys.executable, "main_avid.py", cfg_path], cwd=REPO,
        env=dict(os.environ), capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert max(_committed_steps(run_dir)) == 8, _committed_steps(run_dir)
    log = open(os.path.join(run_dir, "train.log")).read()
    if preempted and max(steps_after_kill) < 8:
        m = re.search(r"resumed from step (\d+)", log)
        assert m, "resume leg did not restore the checkpoint"
        assert int(m.group(1)) >= max(steps_after_kill)
        # a mid-epoch landing must skip already-trained batches, not
        # double-train them (deterministic sampler order)
        if int(m.group(1)) % 2:  # 2 steps/epoch
            assert "mid-epoch resume: skipping" in log
