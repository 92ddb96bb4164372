"""Native shm-ring data plane: cross-process push/pop, framing, limits."""

import multiprocessing as mp
import os

import numpy as np
import pytest

from avid_cma_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def test_build_and_roundtrip_bytes():
    ring = native.ShmRing(f"/avid_test_{os.getpid()}_a", n_slots=4, slot_bytes=1 << 16)
    try:
        ring.push_bytes(b"hello")
        ring.push_bytes(b"world")
        assert len(ring) == 2
        assert ring.pop_bytes() == b"hello"
        assert ring.pop_bytes() == b"world"
    finally:
        ring.free()


def test_batch_framing_roundtrip():
    batch = {
        "frames": np.arange(24, dtype=np.uint8).reshape(2, 3, 4),
        "audio": np.linspace(0, 1, 10, dtype=np.float32),
        "index": np.asarray([3, 9], np.int32),
    }
    out = native.decode_batch(native.encode_batch(batch))
    for k in batch:
        np.testing.assert_array_equal(out[k], batch[k])
        assert out[k].dtype == batch[k].dtype


def test_slot_overflow_rejected():
    ring = native.ShmRing(f"/avid_test_{os.getpid()}_b", n_slots=2, slot_bytes=64)
    try:
        with pytest.raises(ValueError):
            ring.push_bytes(b"x" * 100)
    finally:
        ring.free()


def test_pop_timeout():
    ring = native.ShmRing(f"/avid_test_{os.getpid()}_c", n_slots=2, slot_bytes=64)
    try:
        with pytest.raises(TimeoutError):
            ring.pop_bytes(timeout_ms=50)
    finally:
        ring.free()


def _producer(name):
    ring = native.ShmRing(name, create=False)
    for i in range(5):
        ring.push_batch({"x": np.full((4,), i, np.int64)})
    ring.close_producer()


def test_cross_process_batches():
    name = f"/avid_test_{os.getpid()}_d"
    ring = native.ShmRing(name, n_slots=3, slot_bytes=1 << 12)
    try:
        ctx = mp.get_context("fork")
        p = ctx.Process(target=_producer, args=(name,))
        p.start()
        got = []
        while True:
            b = ring.pop_batch(timeout_ms=20_000)
            if b is None:
                break
            got.append(int(b["x"][0]))
        p.join(timeout=10)
        assert got == [0, 1, 2, 3, 4]
    finally:
        ring.free()


def test_multiprocess_loader_over_ring():
    from avid_cma_tpu.data.loader import MultiprocessDataLoader
    from tests.test_data import make_ds

    ds = make_ds(mode="clip")
    dl = MultiprocessDataLoader(
        ds, batch_size=2, shuffle=False, num_workers=2, slot_mb=8
    )
    batches = list(dl)
    assert len(batches) == 3
    for b in batches:
        assert b["frames"].shape == (2, 4, 64, 80, 3)
        assert b["audio"].shape == (2, 8000)
    idx = np.concatenate([b["index"] for b in batches])
    np.testing.assert_array_equal(idx, np.arange(6))


def test_ring_window_gate():
    """ring_wait_window blocks producers beyond the consumed+window
    horizon and releases them as the consumer reports progress (the
    hard cap on the consumer's out-of-order reorder buffer)."""
    native = pytest.importorskip("avid_cma_tpu.native")
    if not native.available():
        pytest.skip("native toolchain unavailable")
    ring = native.ShmRing("/avid_test_window", n_slots=4, slot_bytes=1 << 16)
    try:
        assert ring.wait_window(0, 4, timeout_ms=100)      # within window
        assert ring.wait_window(3, 4, timeout_ms=100)
        assert not ring.wait_window(4, 4, timeout_ms=100)  # gated
        ring.set_consumed(2)
        assert ring.wait_window(5, 4, timeout_ms=100)      # 5 < 2+4
        assert not ring.wait_window(6, 4, timeout_ms=100)
        ring.close_producer()
        assert ring.wait_window(100, 4, timeout_ms=100)    # closed: release
    finally:
        ring.free()


def test_ring_survives_sigkilled_producer():
    """A producer SIGKILLed mid-stream must not wedge the ring: the
    robust mutex recovers (EOWNERDEAD marked consistent in lock() and
    wait_step()) and the consumer keeps popping other producers' data.
    The kill lands at a random point, so this probabilistically also
    exercises death while holding the mutex."""
    import signal
    import time

    name = f"/avid_test_{os.getpid()}_kill"
    ring = native.ShmRing(name, n_slots=2, slot_bytes=1 << 12)
    try:
        pid = os.fork()
        if pid == 0:  # hot-loop producer, killed externally
            try:
                child = native.ShmRing(name, create=False)
                i = 0
                while True:
                    child.push_batch({"x": np.full(4, i, np.int32)},
                                     timeout_ms=5_000)
                    i += 1
            finally:
                os._exit(0)
        # let it fill/contend, then kill at an arbitrary moment
        for _ in range(50):
            ring.pop_batch(timeout_ms=5_000)
        os.kill(pid, signal.SIGKILL)
        os.waitpid(pid, 0)
        time.sleep(0.05)
        # drain whatever the dead producer left, tolerating its loss
        try:
            while len(ring):
                ring.pop_batch(timeout_ms=1_000)
        except TimeoutError:
            pass
        # the ring must still work end-to-end for a fresh producer
        pid2 = os.fork()
        if pid2 == 0:
            try:
                child = native.ShmRing(name, create=False)
                for i in range(5):
                    child.push_batch({"x": np.full(4, 100 + i, np.int32)},
                                     timeout_ms=5_000)
            finally:
                os._exit(0)
        got = [int(ring.pop_batch(timeout_ms=10_000)["x"][0]) for _ in range(5)]
        os.waitpid(pid2, 0)
        assert got == [100, 101, 102, 103, 104]
    finally:
        ring.free()
