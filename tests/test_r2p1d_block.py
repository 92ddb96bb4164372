"""Fused (2+1)D conv-pair Pallas kernel (ops/pallas/r2p1d_block.py) vs
the XLA two-pass pair — numerical contract (interpret mode on CPU; the
device A/B lives in scripts/r2p1d_block_bench.py, results in PERF.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from avid_cma_tpu.ops.pallas.r2p1d_block import (
    r2p1d_pair_pallas,
    r2p1d_pair_xla,
)


@pytest.mark.parametrize("B,T,H,C", [(2, 4, 16, 64), (1, 2, 8, 128)])
def test_pair_matches_xla(B, T, H, C):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, H, C)) * 0.5, jnp.float32)
    ws = jnp.asarray(rng.normal(size=(1, 3, 3, C, C)) * 0.05, jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 1, 1, C, C)) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    bias = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    got = np.asarray(
        r2p1d_pair_pallas(x, ws, wt, scale, bias, interpret=True)
    )
    want = np.asarray(r2p1d_pair_xla(x, ws, wt, scale, bias))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pair_temporal_edges_zero_padded():
    """First/last frames must see zero (not wrapped/repeated) temporal
    neighbors — encode a signal only in frame 0 and check frame 1's
    contribution pattern."""
    B, T, H, C = 1, 3, 8, 64
    x = np.zeros((B, T, H, H, C), np.float32)
    x[0, 0] = 1.0
    ws = np.zeros((1, 3, 3, C, C), np.float32)
    ws[0, 1, 1] = np.eye(C)  # identity spatial conv
    wt = np.zeros((3, 1, 1, C, C), np.float32)
    wt[0, 0, 0] = np.eye(C) * 2.0  # tap t-1
    wt[1, 0, 0] = np.eye(C) * 3.0  # tap t
    wt[2, 0, 0] = np.eye(C) * 5.0  # tap t+1
    scale = np.ones(C, np.float32)
    bias = np.zeros(C, np.float32)
    out = np.asarray(r2p1d_pair_pallas(
        jnp.asarray(x), jnp.asarray(ws), jnp.asarray(wt),
        jnp.asarray(scale), jnp.asarray(bias), interpret=True,
    ))
    # intermediate = x (identity+relu); conv taps (2,3,5) over (t-1,t,t+1):
    # out[0] sees inter[1]=0 via tap t+1 and inter[0]=1 via tap t -> 3
    # out[1] sees inter[0]=1 via tap t-1 -> 2 ; out[2] -> 0
    np.testing.assert_allclose(out[0, 0, :, :, 0], 3.0)
    np.testing.assert_allclose(out[0, 1, :, :, 0], 2.0)
    np.testing.assert_allclose(out[0, 2, :, :, 0], 0.0)
