"""Multi-process (2-proc CPU rendezvous) exercise of the distributed
substrate: jax.distributed init, per-process loader sharding, and
cross-process meter sync.

Capability reference: multi-node DP entry (main-avid.py:66-78),
DistributedSampler per-process sharding (utils/main_utils.py:214-228),
cross-GPU meter averaging (utils/logger.py:73-79).

The workers run in subprocesses (JAX_PLATFORMS=cpu, a fresh coordinator
port) so the test is independent of this process's backend state.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import json, os, sys
import numpy as np

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)
assert jax.process_count() == nprocs
assert jax.process_index() == proc_id

# --- loader sharding: disjoint shards, equal batch counts ----------------
from avid_cma_tpu.data.loader import ShardedBatchSampler

# divisible dataset size: with padding, DistributedSampler semantics
# deliberately duplicate an index across shards (tested elsewhere)
sampler = ShardedBatchSampler(
    dataset_len=104, batch_size=8, shuffle=True, drop_last=True,
    num_shards=nprocs, shard_index=proc_id, seed=7,
)
sampler.set_epoch(3)
batches = list(sampler)
my_indices = sorted(int(i) for b in batches for i in b)

# --- meter sync: average across processes --------------------------------
from avid_cma_tpu.utils.logger import AverageMeter, ProgressMeter

m = AverageMeter("loss")
m.update(1.0 + proc_id, n=1)  # proc 0 -> 1.0, proc 1 -> 2.0
pm = ProgressMeter(1, [m])
pm.synchronize_meters()

with open(out_path, "w") as f:
    json.dump({
        "proc": proc_id,
        "n_batches": len(batches),
        "indices": my_indices,
        "synced_avg": m.avg,
    }, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous(tmp_path):
    nprocs = 2
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    # workers run by script path: repo root is not on sys.path by default
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs, outs = [], []
    for pid in range(nprocs):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py), str(pid), str(nprocs),
                 str(port), str(out)],
                env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            )
        )
    for p in procs:
        assert p.wait(timeout=220) == 0, "worker failed"

    results = [json.loads(o.read_text()) for o in outs]
    # equal batch counts on every process (lockstep training requirement)
    assert results[0]["n_batches"] == results[1]["n_batches"] > 0
    # shards are disjoint
    s0, s1 = set(results[0]["indices"]), set(results[1]["indices"])
    assert not (s0 & s1)
    # meters synced to the cross-process mean of (1.0, 2.0)
    for r in results:
        np.testing.assert_allclose(r["synced_avg"], 1.5, rtol=1e-6)
