"""Fused stem BN-apply -> ReLU -> 3x3/s2 max-pool op.

Covers the public ``scale_relu_pool`` custom-VJP op (XLA path, used on
CPU and by default on TPU) and the Pallas TPU kernels in interpreter
mode (halo handling across H-tiles, exclusive select-and-scatter-
equivalent gradient routing). Compiled-on-TPU validation: fwd exact vs
the f32-affine reference, bwd within 1 bf16 ulp (dy) / 0.2% (BN param
grads, f32 accumulation order) at the flagship (2,8,112,112,64) shape.

Reference semantics: models/video.py:22-24 of /root/reference
(BatchNorm3d -> ReLU -> MaxPool3d((1,3,3),(1,2,2),(0,1,1))).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import avid_cma_tpu.ops.pallas.stem_pool as sp
from avid_cma_tpu.ops.pallas.stem_pool import (
    _xla_scale_relu_pool,
    scale_relu_pool,
)


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def test_xla_path_matches_unfused(rng=None):
    rng = np.random.default_rng(0)
    y = _rand(rng, (2, 3, 16, 16, 8))
    a = _rand(rng, (8,)) * 0.5 + 1.0
    b = _rand(rng, (8,)) * 0.1
    got = scale_relu_pool(y, a, b)
    yh = jax.nn.relu(y * a + b)
    # unfused reference via flax-style max_pool over (H, W)
    import flax.linen as nn

    ref = nn.max_pool(
        yh.reshape(6, 16, 16, 8),
        window_shape=(3, 3),
        strides=(2, 2),
        padding=((1, 1), (1, 1)),
    ).reshape(2, 3, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_xla_path_grads_flow():
    rng = np.random.default_rng(1)
    y = _rand(rng, (1, 2, 8, 8, 4))
    a = _rand(rng, (4,)) * 0.5 + 1.0
    b = _rand(rng, (4,)) * 0.1

    def loss(y, a, b):
        return jnp.sum(scale_relu_pool(y, a, b) ** 2)

    dy, da, db = jax.grad(loss, argnums=(0, 1, 2))(y, a, b)
    assert dy.shape == y.shape and da.shape == a.shape and db.shape == b.shape
    assert float(jnp.sum(jnp.abs(da))) > 0


@pytest.mark.parametrize(
    "shape",
    [(1, 8, 8, 8), (2, 12, 16, 8), (1, 28, 12, 4)],
    ids=["single-block", "three-hblocks", "hb28"],
)
def test_pallas_kernels_interpret(shape, monkeypatch):
    """Interpret-mode parity of the Pallas fwd/bwd kernels vs XLA,
    including multi-H-tile halo handling and first-max tie routing."""
    monkeypatch.setattr(
        sp.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    rng = np.random.default_rng(2)
    n, h, w, c = shape
    y = _rand(rng, (n, h, w, c))
    a = _rand(rng, (c,)) * 0.5 + 1.0
    b = _rand(rng, (c,)) * 0.1

    out = sp._pallas_fwd(y, a, b)
    ref = _xla_scale_relu_pool(y[:, None], a, b)[:, 0]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )

    g = _rand(rng, out.shape)
    dy, da, db = sp._pallas_bwd(y, a, b, g)

    def f(y, a, b):
        return _xla_scale_relu_pool(y[:, None], a, b)[:, 0]

    _, vjp = jax.vjp(f, y, a, b)
    rdy, rda, rdb = vjp(g)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(rdy), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(da), np.asarray(rda), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(rdb), rtol=1e-4, atol=1e-5
    )


def test_pallas_tie_routing_matches_select_and_scatter(monkeypatch):
    """bf16-style ties: duplicate values in a window must route the
    gradient to the FIRST row-major max only (torch/XLA semantics)."""
    monkeypatch.setattr(
        sp.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    rng = np.random.default_rng(3)
    n, h, w, c = 2, 8, 8, 4
    # quantize hard so ties are everywhere
    y = jnp.round(_rand(rng, (n, h, w, c)) * 2.0) / 2.0
    a = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    g = _rand(rng, (n, h // 2, w // 2, c))
    dy, _, _ = sp._pallas_bwd(y, a, b, g)

    def f(y):
        return _xla_scale_relu_pool(y[:, None], a, b)[:, 0]

    _, vjp = jax.vjp(f, y)
    (rdy,) = vjp(g)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(rdy), atol=1e-6)


def test_model_stem_module_uses_op():
    """StemBNReLUPool must keep the exact BatchNorm param/stat layout so
    checkpoints are unchanged (scale/bias params, batch_stats mean/var)."""
    from avid_cma_tpu.models.blocks import StemBNReLUPool

    rng = np.random.default_rng(4)
    x = _rand(rng, (2, 4, 16, 16, 8))
    mod = StemBNReLUPool()
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    assert set(variables["params"].keys()) == {"scale", "bias"}
    assert set(variables["batch_stats"].keys()) == {"mean", "var"}
    out, updates = mod.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 4, 8, 8, 8)
    # running stats must move toward the batch stats
    assert not np.allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        np.asarray(variables["batch_stats"]["mean"]),
    )
