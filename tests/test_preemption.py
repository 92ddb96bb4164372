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


def _launch(cfg_path):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    return subprocess.Popen(
        [sys.executable, "main_avid.py", cfg_path], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


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

    proc = _launch(cfg_path)
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
        out, err = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    steps_after_kill = _committed_steps(run_dir)
    assert steps_after_kill, (
        f"no committed checkpoint before kill/exit; stderr: {err[-3000:]}"
    )
    if not preempted:
        # process finished before we could kill it (very fast host) —
        # the resume leg below still must be a clean no-op continuation
        assert proc.returncode == 0, err[-3000:]

    # relaunch: resume from the last committed step and run to the end
    r = subprocess.run(
        [sys.executable, "main_avid.py", cfg_path], cwd=REPO,
        env=dict(os.environ,
                 JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_test_cache"),
        capture_output=True, text=True, timeout=1200,
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
