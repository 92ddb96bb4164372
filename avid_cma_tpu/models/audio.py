"""2D conv audio backbone over log-spectrograms (flax.linen, NHWC).

Capability reference: models/audio.py:15-44 (Conv2D depth 10: 1->64 k7 s2
stem + 4 Basic2DBlocks 64/128/256/512 with strides (2,2),(2,2),(2,2),(1,1),
AdaptiveMaxPool2d(1) head, taps conv2x..conv5x/pool).

Input layout: (B, T, F, 1) — time x frequency spectrogram, channels-last.
"""

from __future__ import annotations

from typing import Dict, Union

import flax.linen as nn
import jax.numpy as jnp

from avid_cma_tpu.models.blocks import Basic2DBlock, _pad, batch_norm
from avid_cma_tpu.registry import MODELS


@MODELS.register("Conv2D")
class Conv2D(nn.Module):
    depth: int = 10
    dtype: jnp.dtype | None = None

    out_dim: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        return_embs: bool = False,
    ) -> Union[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """x: (B, T, F, 1) log-spectrogram. Returns pooled (B, 512) features,
        or a dict of intermediate taps when `return_embs`."""
        assert self.depth == 10, "reference supports depth 10 only (models/audio.py:18)"

        h = nn.Conv(
            64,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=_pad((7, 7)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x_c1 = nn.relu(batch_norm(train, name="bn1", dtype=self.dtype)(h))

        x_b1 = Basic2DBlock(64, stride=(2, 2), dtype=self.dtype, name="block1")(
            x_c1, train=train
        )
        x_b2 = Basic2DBlock(128, stride=(2, 2), dtype=self.dtype, name="block2")(
            x_b1, train=train
        )
        x_b3 = Basic2DBlock(256, stride=(2, 2), dtype=self.dtype, name="block3")(
            x_b2, train=train
        )
        x_b4 = Basic2DBlock(512, dtype=self.dtype, name="block4")(x_b3, train=train)

        # AdaptiveMaxPool2d((1,1)) == global max over (T, F).
        pool = jnp.max(x_b4, axis=(1, 2))

        if return_embs:
            return {
                "conv2x": x_b1,
                "conv3x": x_b2,
                "conv4x": x_b3,
                "conv5x": x_b4,
                "pool": pool,
            }
        return pool
