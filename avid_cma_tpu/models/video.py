"""R(2+1)D video backbone (flax.linen, NTHWC channels-last).

Capability reference: models/video.py:12-54 (R2Plus1D depths 10/18/34,
full-3D (3,7,7) stem, AdaptiveMaxPool3d(1) head, `return_embs` taps
conv1/conv2x..conv5x/pool). The tap names are load-bearing for the
linear-probe eval (configs/benchmark/kinetics/8x224x224-linear.yaml).

TPU-first: channels-last, bf16-capable compute dtype, global max pool as
a fused reduce; taps returned as a dict of intermediates (pure function).
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from avid_cma_tpu.models.blocks import BasicR2P1DBlock, StemBNReLUPool, _pad
from avid_cma_tpu.ops.conv3d import Conv3D
from avid_cma_tpu.registry import MODELS

# Per-depth stage configurations: number of blocks per stage
# (reference: models/video.py:26-40).
_STAGE_BLOCKS = {
    10: (1, 1, 1, 1),
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
}
_STAGE_PLANES = (64, 128, 256, 512)


@MODELS.register("R2Plus1D")
class R2Plus1D(nn.Module):
    depth: int = 18
    dtype: jnp.dtype | None = None
    # stages (2..5 = conv2x..conv5x) whose blocks are rematerialized in
    # the backward pass (jax.checkpoint): saves only each block's input
    # instead of its four conv intermediates. A bandwidth/capacity trade
    # for the early high-resolution stages; OFF by default (measured
    # slower on v5e, PERF.md).
    remat_stages: Tuple[int, ...] = ()

    out_dim: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        return_embs: bool = False,
    ) -> Union[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """x: (B, T, H, W, 3) video clip. Returns pooled (B, 512) features,
        or a dict of intermediate taps when `return_embs`."""
        assert self.depth in _STAGE_BLOCKS, f"unsupported depth {self.depth}"

        # Full-3D stem: conv (3,7,7) stride (1,2,2) + maxpool (1,3,3)/(1,2,2)
        # (reference: models/video.py:19-24). MXU-shaped temporal-tap-stack
        # formulation (ops/conv3d.py) — parameters identical to nn.Conv.
        h = Conv3D(
            64,
            kernel_size=(3, 7, 7),
            strides=(1, 2, 2),
            padding=_pad((3, 7, 7)),
            dtype=self.dtype,
            name="conv1",
        )(x)
        # BN + ReLU + max-pool fused into one pass over the 411 MB stem
        # activation (Pallas on TPU; see ops/pallas/stem_pool.py)
        x_c1 = StemBNReLUPool(name="bn1")(h, train=train)

        taps = {"conv1": x_c1}
        h = x_c1
        for stage_idx, (n_blocks, planes) in enumerate(
            zip(_STAGE_BLOCKS[self.depth], _STAGE_PLANES)
        ):
            stride = (1, 1, 1) if stage_idx == 0 else (2, 2, 2)
            block_cls = BasicR2P1DBlock
            if stage_idx + 2 in self.remat_stages:
                block_cls = nn.remat(BasicR2P1DBlock, static_argnums=(2,))
            for b in range(n_blocks):
                h = block_cls(
                    planes,
                    stride=stride if b == 0 else (1, 1, 1),
                    dtype=self.dtype,
                    name=f"conv{stage_idx + 2}x_{b}",
                )(h, train)
            taps[f"conv{stage_idx + 2}x"] = h

        # AdaptiveMaxPool3d((1,1,1)) == global max over (T, H, W)
        # (reference: models/video.py:41).
        pool = jnp.max(h, axis=(1, 2, 3))
        taps["pool"] = pool

        if return_embs:
            return taps
        return pool
