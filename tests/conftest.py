"""Test harness: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the real TPU chip),
# but tests must run on a virtual 8-device mesh. The axon sitecustomize hook
# (PYTHONPATH=/root/.axon_site) force-registers the TPU backend at interpreter
# startup, overriding the JAX_PLATFORMS env var — so we must ALSO override via
# jax.config.update, which wins over the plugin registration. The env vars are
# still set for any subprocesses tests may spawn.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # stops sitecustomize in children
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles of the 3D conv nets take
# minutes; cache them across pytest runs. Keyed by (target, jax version,
# machine fingerprint) — XLA:CPU AOT entries bake in machine features, so
# a directory shared across machine types spams load errors and never
# hits (utils/compile_cache.py). Exported via env so every subprocess the
# tests spawn shares the same warm namespace.
from avid_cma_tpu.utils.compile_cache import cache_dir  # noqa: E402

_CACHE = cache_dir("cpu-tests")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("data",))


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
