"""MXU conv formulations (ops/conv3d.py) vs XLA's direct 3D conv.

Every switchable formulation must be an exact reformulation of
lax.conv_general_dilated on the geometry it claims (identical math up to
f32 reassociation). Reference geometries: the R(2+1)D stem (3,7,7)/s(1,2,2)
(/root/reference/models/video.py:19-21) and the factorized block's
(1,3,3)/(3,1,1) pair (/root/reference/models/network_blocks.py:38-44).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avid_cma_tpu.ops.conv3d import (
    _conv3d_direct,
    _s2d_applicable,
    conv3d_1x1,
    conv3d_s2d,
    conv3d_spatial,
    conv3d_temporal,
    conv3d_tstack,
)


def _mk(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _same_pad(k):
    return [(d // 2, d // 2) for d in k]


@pytest.mark.parametrize(
    "shape,k,strides",
    [
        ((2, 4, 16, 16, 3), (3, 7, 7), (1, 2, 2)),  # stem
        ((1, 2, 8, 12, 3), (3, 3, 3), (1, 2, 2)),
        ((2, 3, 28, 28, 5), (1, 5, 5), (1, 2, 2)),  # even half-width
    ],
)
def test_s2d_exact(shape, k, strides):
    rng = np.random.default_rng(0)
    x = _mk(rng, shape)
    w = _mk(rng, (*k, shape[-1], 8))
    pad = _same_pad(k)
    assert _s2d_applicable(x, w, strides, pad)
    got = conv3d_s2d(x, w, strides, pad)
    ref = _conv3d_direct(x, w, strides, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_s2d_weight_grad_lands_in_reference_layout():
    rng = np.random.default_rng(1)
    x = _mk(rng, (1, 2, 8, 8, 3))
    w = _mk(rng, (3, 7, 7, 3, 4))
    strides, pad = (1, 2, 2), _same_pad((3, 7, 7))
    g1 = jax.grad(lambda w: jnp.sum(conv3d_s2d(x, w, strides, pad) ** 2))(w)
    g2 = jax.grad(lambda w: jnp.sum(_conv3d_direct(x, w, strides, pad) ** 2))(w)
    assert g1.shape == w.shape
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_s2d_not_applicable_odd_sizes():
    rng = np.random.default_rng(2)
    x = _mk(rng, (1, 2, 9, 8, 3))  # odd H
    w = _mk(rng, (3, 7, 7, 3, 4))
    assert not _s2d_applicable(x, w, (1, 2, 2), _same_pad((3, 7, 7)))
    assert not _s2d_applicable(
        _mk(rng, (1, 2, 8, 8, 3)), w, (1, 1, 1), _same_pad((3, 7, 7))
    )


def test_tstack_exact():
    rng = np.random.default_rng(3)
    x = _mk(rng, (2, 4, 12, 12, 3))
    w = _mk(rng, (3, 7, 7, 3, 8))
    strides, pad = (1, 2, 2), _same_pad((3, 7, 7))
    got = conv3d_tstack(x, w, strides, pad)
    ref = _conv3d_direct(x, w, strides, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spatial_exact():
    rng = np.random.default_rng(4)
    x = _mk(rng, (2, 4, 14, 14, 16))
    w = _mk(rng, (1, 3, 3, 16, 8))
    strides, pad = (1, 2, 2), _same_pad((1, 3, 3))
    got = conv3d_spatial(x, w, strides, pad)
    ref = _conv3d_direct(x, w, strides, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_temporal_and_1x1_exact():
    rng = np.random.default_rng(5)
    x = _mk(rng, (2, 6, 7, 7, 16))
    w = _mk(rng, (3, 1, 1, 16, 8))
    strides, pad = (1, 1, 1), _same_pad((3, 1, 1))
    np.testing.assert_allclose(
        np.asarray(conv3d_temporal(x, w, strides, pad)),
        np.asarray(_conv3d_direct(x, w, strides, pad)),
        rtol=1e-4, atol=1e-4,
    )
    w1 = _mk(rng, (1, 1, 1, 16, 8))
    np.testing.assert_allclose(
        np.asarray(conv3d_1x1(x, w1, (1, 2, 2))),
        np.asarray(_conv3d_direct(x, w1, (1, 2, 2), [(0, 0)] * 3)),
        rtol=1e-4, atol=1e-4,
    )


def test_forms_fall_back_on_unsupported_geometry():
    """The FORMS switch may change speed, never math: geometries an
    alternate form can't express (temporal stride/padding on fold2d,
    padding on the 1x1x1 matmul, non-SAME temporal padding on tstack)
    must route to the direct conv."""
    import avid_cma_tpu.ops.conv3d as c3
    from avid_cma_tpu.ops.conv3d import Conv3D

    rng = np.random.default_rng(11)
    saved = dict(c3.FORMS)
    try:
        cases = [
            # (forms update, x shape, kernel, strides, padding)
            ({"spatial": "fold2d"}, (2, 8, 8, 8, 3), (1, 3, 3), (2, 1, 1),
             [(0, 0), (1, 1), (1, 1)]),
            ({"spatial": "fold2d"}, (2, 8, 8, 8, 3), (1, 3, 3), (1, 1, 1),
             [(1, 1), (1, 1), (1, 1)]),
            ({"proj": "matmul"}, (2, 4, 8, 8, 3), (1, 1, 1), (1, 1, 1),
             [(0, 0), (1, 1), (1, 1)]),
            ({"stem": "tstack"}, (2, 8, 8, 8, 3), (3, 3, 3), (1, 1, 1),
             [(2, 2), (1, 1), (1, 1)]),
        ]
        for update, xs, k, strides, pad in cases:
            x = _mk(rng, xs)
            c3.FORMS.update(saved)
            c3.FORMS.update(update)
            m = Conv3D(features=6, kernel_size=k, strides=strides,
                       padding=pad)
            var = m.init(jax.random.key(0), x)
            got = m.apply(var, x)
            c3.FORMS.update(
                {"spatial": "xla3d", "proj": "xla3d", "stem": "xla3d"}
            )
            ref = m.apply(var, x)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4,
                err_msg=f"{update} {xs} {k} {strides} {pad}",
            )
    finally:
        c3.FORMS.update(saved)
