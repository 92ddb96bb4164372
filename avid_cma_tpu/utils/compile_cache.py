"""Persistent XLA compile-cache location, keyed by target + machine.

XLA:CPU's persistent cache stores AOT-compiled executables whose machine
features (CPU flags) are baked into the entry; loading an entry that was
compiled on a different machine type fails with
``XLA:CPU AOT compilation result's machine features don't match`` error
spam on stderr and a silent full recompile — so a cache directory shared
across machine types is both noisy and cold. Sharing one directory
between the CPU test mesh and the tunneled-TPU bench likewise interleaves
unrelated entries. This module derives a per-(tag, jax version, machine)
directory so every target gets its own namespace and entries always load
cleanly on the machine that wrote them.

Used by tests/conftest.py (and through it every subprocess the tests
spawn), bench.py, and __graft_entry__.py.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform
import re

_BASE = os.path.join(os.path.expanduser("~"), ".cache", "avid_jax_cache")


def machine_fingerprint() -> str:
    """Short hash of the CPU identity (arch + model + feature flags) —
    the same inputs XLA:CPU bakes into its AOT entries."""
    bits = [_platform.machine(), _platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        m = re.search(r"model name\s*:\s*(.+)", txt)
        if m:
            bits.append(m.group(1).strip())
        m = re.search(r"^flags\s*:\s*(.+)$", txt, re.M)
        if m:
            bits.append(m.group(1).strip())
    except OSError:
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]


def cache_dir(tag: str = "cpu", base: str | None = None) -> str:
    """Cache directory for one compilation target.

    `tag` names the target class ("cpu-tests", "bench", ...); the jax
    version and machine fingerprint are appended so upgrades and host
    changes roll to a fresh namespace instead of emitting AOT-mismatch
    load errors against stale entries.
    """
    try:
        import jax

        ver = jax.__version__
    except Exception:  # pragma: no cover - jax is a hard dep in practice
        ver = "unknown"
    d = os.path.join(base or _BASE, f"{tag}-jax{ver}-{machine_fingerprint()}")
    os.makedirs(d, exist_ok=True)
    return d
