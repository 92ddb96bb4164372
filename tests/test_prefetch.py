"""Device prefetch (data/prefetch.py) + compile-cache keying
(utils/compile_cache.py).

The prefetcher is the H2D double-buffering layer the train loop runs
every batch through (reference analogue: pinned-memory
``.cuda(non_blocking=True)`` in main-avid.py:161-163); these tests pin
its contract: every batch yielded exactly once, in order, already
row-sharded on the mesh, scalars replicated.
"""

import os

import jax
import numpy as np
import pytest

from avid_cma_tpu.data.prefetch import device_prefetch, place_batch
from avid_cma_tpu.parallel.mesh import DATA_AXIS, make_mesh
from avid_cma_tpu.utils.compile_cache import cache_dir, machine_fingerprint


def _batches(n, rows=8):
    for i in range(n):
        yield {
            "frames": np.full((rows, 2, 4, 4, 3), i, np.float32),
            "index": np.arange(rows) + i * rows,
            "epoch": np.int32(i),  # 0-d: must replicate, not shard
        }


def test_prefetch_yields_all_batches_in_order():
    mesh = make_mesh()
    out = list(device_prefetch(_batches(5), mesh))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["frames"][0, 0, 0, 0, 0]) == i
        np.testing.assert_array_equal(
            np.asarray(b["index"]), np.arange(8) + i * 8
        )


def test_prefetch_shards_rows_replicates_scalars():
    mesh = make_mesh()
    (b,) = list(device_prefetch(_batches(1), mesh))
    assert isinstance(b["frames"], jax.Array)
    spec = b["frames"].sharding.spec
    assert spec[0] == DATA_AXIS
    # each device holds batch/n rows
    n = mesh.devices.size
    shard = b["frames"].addressable_shards[0]
    assert shard.data.shape[0] == 8 // n
    # 0-d scalar is replicated
    assert b["epoch"].sharding.is_fully_replicated


@pytest.mark.parametrize("n,depth", [(0, 2), (1, 2), (2, 2), (7, 3), (3, 1)])
def test_prefetch_depth_edge_cases(n, depth):
    mesh = make_mesh()
    out = list(device_prefetch(_batches(n), mesh, depth=depth))
    assert [int(b["epoch"]) for b in out] == list(range(n))


def test_prefetch_rejects_bad_depth():
    mesh = make_mesh()
    with pytest.raises(ValueError):
        list(device_prefetch(_batches(1), mesh, depth=0))


def test_prefetch_keeps_at_most_depth_ahead():
    """The prefetcher must not drain the loader eagerly — at most `depth`
    batches may be pulled before the consumer takes the first one."""
    mesh = make_mesh()
    pulled = []

    def tracking():
        for i in range(6):
            pulled.append(i)
            yield {"index": np.arange(8) + i}

    it = device_prefetch(tracking(), mesh, depth=2)
    first = next(it)
    # first yield: buffer refilled to depth after the pop -> 3 pulled
    assert len(pulled) <= 3
    np.testing.assert_array_equal(np.asarray(first["index"]), np.arange(8))


def test_place_batch_matches_host_values():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    host = {"x": rng.normal(size=(8, 5)).astype(np.float32)}
    dev = place_batch(host, mesh)
    np.testing.assert_array_equal(np.asarray(dev["x"]), host["x"])


def test_cache_dir_keyed_by_tag_and_machine(tmp_path):
    a = cache_dir("cpu-tests", base=str(tmp_path))
    b = cache_dir("bench", base=str(tmp_path))
    assert a != b
    assert os.path.isdir(a) and os.path.isdir(b)
    fp = machine_fingerprint()
    assert fp in a and fp in b
    assert jax.__version__ in os.path.basename(a)
    # deterministic on the same machine
    assert cache_dir("cpu-tests", base=str(tmp_path)) == a
