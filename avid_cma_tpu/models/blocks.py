"""Conv building blocks (flax.linen, channels-last NDHWC/NHWC).

TPU-first design notes:
  * channels-last layouts so XLA lowers convs straight onto the MXU
  * BatchNorm is per-replica (no cross-device stat sync) matching the
    reference's DDP behavior, which never syncs BN
    (reference: models/network_blocks.py:13-60; DDP wrap utils/main_utils.py:104-117)
  * R(2+1)D factorization keeps both convs MXU-shaped: the spatial
    (1,3,3) conv and temporal (3,1,1) conv are each dense channel matmuls

Capability reference: models/network_blocks.py:13-27 (Basic2DBlock),
models/network_blocks.py:30-60 (BasicR2P1DBlock).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from avid_cma_tpu.ops.conv3d import Conv1x1x1, Conv3D

# Torch BatchNorm defaults: eps=1e-5, running-stat update rate 0.1
# (flax `momentum` is the retain rate: new = momentum*old + (1-momentum)*batch).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def batch_norm(train: bool, name: str | None = None, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        name=name,
        dtype=dtype,
    )


def _pad(k: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """SAME-style explicit padding for odd kernels (torch padding=k//2)."""
    return tuple((d // 2, d // 2) for d in k)


class StemBNReLUPool(nn.Module):
    """BatchNorm -> ReLU -> MaxPool3d((1,3,3), s(1,2,2), p(0,1,1)) as one
    fused op (reference models/video.py:22-24).

    Parameter/collection layout is identical to nn.BatchNorm (params
    scale/bias, batch_stats mean/var; stats in float32, flax var formula
    mean(x^2) - mean(x)^2, retain-rate momentum), so checkpoints are
    unchanged. The normalize+relu+pool runs through the scale_relu_pool
    custom-VJP op (ops/pallas/stem_pool.py): the XLA composition by
    default, or a validated single-pass Pallas kernel with
    AVID_STEM_POOL=pallas (slower than XLA's fusions on v5e — see the
    kernel module docstring for measurements)."""

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        from jax import lax

        from avid_cma_tpu.ops.pallas.stem_pool import scale_relu_pool

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        a = scale * lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return scale_relu_pool(x, a, b)


class Basic2DBlock(nn.Module):
    """conv3x3-BN-ReLU x2, no residual (reference: models/network_blocks.py:13-27)."""

    out_planes: int
    stride: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(
            self.out_planes,
            kernel_size=(3, 3),
            strides=self.stride,
            padding=_pad((3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.relu(batch_norm(train, name="bn1", dtype=self.dtype)(x))
        x = nn.Conv(
            self.out_planes,
            kernel_size=(3, 3),
            padding=_pad((3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(x)
        x = nn.relu(batch_norm(train, name="bn2", dtype=self.dtype)(x))
        return x


class BasicR2P1DBlock(nn.Module):
    """R(2+1)D residual block: (1,3,3) spatial then (3,1,1) temporal conv,
    twice, with a 1x1x1 projection residual when shape changes
    (reference: models/network_blocks.py:30-60).

    Input layout: (B, T, H, W, C).
    """

    out_planes: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        in_planes = x.shape[-1]
        spt_stride = (1, self.stride[1], self.stride[2])
        tmp_stride = (self.stride[0], 1, 1)

        h = Conv3D(
            self.out_planes,
            kernel_size=(1, 3, 3),
            strides=spt_stride,
            padding=_pad((1, 3, 3)),
            dtype=self.dtype,
            name="spt_conv1",
        )(x)
        h = nn.relu(batch_norm(train, name="spt_bn1", dtype=self.dtype)(h))
        h = Conv3D(
            self.out_planes,
            kernel_size=(3, 1, 1),
            strides=tmp_stride,
            padding=_pad((3, 1, 1)),
            dtype=self.dtype,
            name="tmp_conv1",
        )(h)
        h = nn.relu(batch_norm(train, name="tmp_bn1", dtype=self.dtype)(h))

        h = Conv3D(
            self.out_planes,
            kernel_size=(1, 3, 3),
            padding=_pad((1, 3, 3)),
            dtype=self.dtype,
            name="spt_conv2",
        )(h)
        h = nn.relu(batch_norm(train, name="spt_bn2", dtype=self.dtype)(h))
        h = Conv3D(
            self.out_planes,
            kernel_size=(3, 1, 1),
            padding=_pad((3, 1, 1)),
            dtype=self.dtype,
            name="tmp_conv2",
        )(h)

        if in_planes != self.out_planes or any(s != 1 for s in self.stride):
            res = Conv1x1x1(
                self.out_planes,
                strides=self.stride,
                dtype=self.dtype,
                name="res_conv",
            )(x)
        else:
            res = x

        out = nn.relu(batch_norm(train, name="out_bn", dtype=self.dtype)(h + res))
        return out
