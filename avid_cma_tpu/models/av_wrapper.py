"""Audio-visual wrapper: two backbones + per-modality MLP projection heads.

Capability reference: models/av_wrapper.py:17-76 (Head MLP with ReLU
between layers; AV_Wrapper returning (video_emb, audio_emb); `av_wrapper`
registry factory with proj_dim=[512,512,128]).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from avid_cma_tpu.registry import MODELS


class Head(nn.Module):
    """MLP projection head (reference: models/av_wrapper.py:17-33).

    ALWAYS computes in float32, whatever `dtype` the backbones run at.
    Instance discrimination lives or dies on sub-ulp-of-bf16 embedding
    differences: unit-normalized 128-d embeddings quantize to ~0.004
    cosine steps in bf16, coarser than the spread separating hard
    instances — a full bf16 AVID pretrain on the learnable dataset
    collapsed every instance to ONE embedding (bank rows at cos 0.9998,
    retrieval/probe at exact chance; round-5 LEARNPROOF forensics)
    while f32 learns 6-7x chance. The standard contrastive
    mixed-precision split: backbone convs (99.9% of FLOPs) in bf16,
    projection head + loss in f32 — three tiny Dense layers, measured
    throughput-neutral at the flagship shape (PERF.md). `dtype` is kept
    in the signature so a config can force bf16 heads for A/Bs."""

    proj_dims: Sequence[int]
    dtype: jnp.dtype | None = None
    force_f32: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dims = list(self.proj_dims)
        dtype = None if self.force_f32 else self.dtype
        if self.force_f32:
            x = x.astype(jnp.float32)
        for i, d in enumerate(dims):
            x = nn.Dense(d, dtype=dtype, name=f"linear{i}")(x)
            if i < len(dims) - 1:
                x = nn.relu(x)
        return x

    @property
    def out_dim(self) -> int:
        return list(self.proj_dims)[-1]


class AVWrapper(nn.Module):
    """Joint AV model: video/audio backbones + projection heads
    (reference: models/av_wrapper.py:36-61).

    __call__(video, audio) -> (video_emb, audio_emb), each (B, proj_dim[-1]).
    """

    video_model: nn.Module
    audio_model: nn.Module
    proj_dim: Any = 128  # int | list[int] | None
    dtype: jnp.dtype | None = None

    def setup(self):
        if self.proj_dim is not None:
            dims = (
                list(self.proj_dim)
                if isinstance(self.proj_dim, (list, tuple))
                else [self.proj_dim]
            )
            self.video_proj = Head(dims, dtype=self.dtype)
            self.audio_proj = Head(dims, dtype=self.dtype)

    @property
    def out_dim(self) -> int:
        """Embedding width (reference: model.module.out_dim injected into
        the loss args, main-avid.py:100). A property, not a setup
        attribute, so it works on unbound host-side instances too."""
        if self.proj_dim is None:
            return self.video_model.out_dim
        dims = (
            list(self.proj_dim)
            if isinstance(self.proj_dim, (list, tuple))
            else [self.proj_dim]
        )
        return dims[-1]

    def __call__(
        self,
        video: jnp.ndarray,
        audio: jnp.ndarray,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        video_emb = self.video_model(video, train=train)
        audio_emb = self.audio_model(audio, train=train)
        if self.proj_dim is not None:
            video_emb = self.video_proj(video_emb)
            audio_emb = self.audio_proj(audio_emb)
        return video_emb, audio_emb

    def embeddings(
        self, video: jnp.ndarray, audio: jnp.ndarray, train: bool = False
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Intermediate taps for both modalities (eval probes)."""
        return {
            "video": self.video_model(video, train=train, return_embs=True),
            "audio": self.audio_model(audio, train=train, return_embs=True),
        }


@MODELS.register("av_wrapper")
def av_wrapper(
    video_backbone: str,
    video_backbone_args: dict | None = None,
    audio_backbone: str = "Conv2D",
    audio_backbone_args: dict | None = None,
    proj_dim: Any = 128,
    checkpoint: str | None = None,
    dtype: jnp.dtype | None = None,
) -> AVWrapper:
    """Factory resolving backbones by registry name
    (reference: models/av_wrapper.py:64-76). `checkpoint` (a .pth.tar or
    orbax path) is handled by the caller via train.checkpoint utilities;
    it is accepted here for config compatibility.
    """
    video_model = MODELS.get(video_backbone)(
        **dict(video_backbone_args or {}), dtype=dtype
    )
    audio_model = MODELS.get(audio_backbone)(
        **dict(audio_backbone_args or {}), dtype=dtype
    )
    return AVWrapper(
        video_model=video_model,
        audio_model=audio_model,
        proj_dim=proj_dim,
        dtype=dtype,
    )
