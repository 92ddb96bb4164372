"""Pallas TPU kernel: fused (2+1)D conv pair — the SURVEY §7.8 experiment.

The conv2x stage is 42% of the train step (PERF.md profile) and its
R(2+1)D pairs are: spatial (1,3,3) conv -> BN -> ReLU -> temporal (3,1,1)
conv (reference models/network_blocks.py:13-31). XLA runs the pair as two
passes over the 56^2 x 64ch intermediate (write I fused with stats
reduce, read I with BN-apply fused into the temporal conv). This kernel
is the structural best case for a fused block: grid over batch, the
ENTIRE (T, 56, 56, 64) intermediate lives in VMEM scratch, zero
intermediate HBM traffic; BN is a folded scale/bias (stats given), i.e.
it measures the ceiling a fused train-mode block could reach IF the
batch-stats dependency were free. If even this does not beat XLA's
measured pair, the fused-block idea is dead for every mode — that is the
A/B `scripts/r2p1d_block_bench.py` runs (results: PERF.md).

Spatial conv as ONE MXU dot per frame: the 9 shifted (HW, 64) views are
packed along K into (HW, 576) — K=576 fills the MXU K dimension; the
64-lane output (model channel width) is the irreducible half-occupancy
both XLA and Pallas face at C=64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_kernel(
    x_ref,      # (1, T, H+2, W+2, C) VMEM  spatially pre-padded input
    ws_ref,     # (9*C, C)            VMEM  spatial taps packed (dy,dx,cin)
    wt_ref,     # (3*C, C)            VMEM  temporal taps packed (dt,cin)
    scale_ref,  # (1, C)              VMEM  folded BN scale
    bias_ref,   # (1, C)              VMEM  folded BN bias
    out_ref,    # (1, T, H, W, C)     VMEM
    inter_ref,  # (T, H*W, C) x.dtype VMEM scratch: the fused intermediate
    *,
    T: int,
    H: int,
    W: int,
    C: int,
):
    # HIGHEST (multi-pass f32 emulation) is only meaningful — and only
    # accepted by Mosaic — for f32 operands; bf16 operands take the MXU's
    # native bf16 x bf16 -> f32 path, same as XLA's conv emitter.
    hp = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)

    # ---- spatial conv + BN-apply + ReLU, intermediate stays in VMEM ----
    for t in range(T):
        # pack the 9 shifted views along K: (H*W, 9*C)
        cols = [
            x_ref[0, t, dy : dy + H, dx : dx + W, :].reshape(H * W, C)
            for dy in range(3)
            for dx in range(3)
        ]
        patch = jnp.concatenate(cols, axis=1)  # (H*W, 9C)
        acc = jnp.dot(patch, ws_ref[:], preferred_element_type=jnp.float32,
                      precision=hp)
        y = acc * scale_ref[0][None, :] + bias_ref[0][None, :]
        # store in x.dtype: the XLA pair round-trips the intermediate
        # through bf16 HBM, so bf16 storage keeps the comparison exact
        # AND halves the scratch footprint
        inter_ref[t] = jnp.maximum(y, 0.0).astype(inter_ref.dtype)

    # ---- temporal conv (3,1,1), zero-padded at the t edges ----
    zeros = jnp.zeros((H * W, C), inter_ref.dtype)
    for t in range(T):
        taps = [
            inter_ref[t - 1] if t - 1 >= 0 else zeros,
            inter_ref[t],
            inter_ref[t + 1] if t + 1 < T else zeros,
        ]
        patch = jnp.concatenate(taps, axis=1)  # (H*W, 3C)
        acc = jnp.dot(patch, wt_ref[:], preferred_element_type=jnp.float32,
                      precision=hp)
        out_ref[0, t] = acc.reshape(H, W, C).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def r2p1d_pair_pallas(
    x: jnp.ndarray,        # (B, T, H, W, C)
    w_spatial: jnp.ndarray,  # (1, 3, 3, C, C)  THWIO
    w_temporal: jnp.ndarray,  # (3, 1, 1, C, C)
    scale: jnp.ndarray,    # (C,) folded BN scale  gamma/sqrt(var+eps)
    bias: jnp.ndarray,     # (C,) folded BN bias   beta - mean*scale
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused spatial-conv -> BN(folded) -> ReLU -> temporal-conv forward.
    SAME padding both convs, stride 1 (the non-downsampling conv2x pair)."""
    B, T, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    ws = w_spatial.reshape(9 * C, C)  # (dy,dx,cin) packed along K
    wt = w_temporal.reshape(3 * C, C)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, T=T, H=H, W=W, C=C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, H + 2, W + 2, C), lambda b: (b, 0, 0, 0, 0)),
            pl.BlockSpec((9 * C, C), lambda b: (0, 0)),
            pl.BlockSpec((3 * C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, H, W, C), lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((T, H * W, C), x.dtype)],
        # the whole-clip block + unrolled concat temporaries exceed the
        # 16 MB default scoped-vmem stack; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, ws, wt, scale.reshape(1, C), bias.reshape(1, C))
    return out


def r2p1d_pair_xla(x, w_spatial, w_temporal, scale, bias):
    """The XLA path this kernel races: two convs with the BN-apply+ReLU
    between them (exactly what the model's conv2x pair lowers to in a
    train step once stats are known)."""
    dn = ("NTHWC", "THWIO", "NTHWC")
    y = jax.lax.conv_general_dilated(
        x, w_spatial, (1, 1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y * scale + bias, 0.0).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w_temporal, (1, 1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)
