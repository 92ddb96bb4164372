"""Device-side preprocessing pipelines: raw host batches -> model inputs.

Replaces the reference's CPU transform stack (datasets/preprocessing.py
VideoPrep_MSC_CJ / VideoPrep_Crop_CJ / AudioPrep / LogSpectrogram) with a
single jitted function per phase: uint8 frames + waveforms in, normalized
(B,T,S,S,3) clips + (B,T,F,1) spectrograms out. Audio volume jitter
(+/-10%, AudioPrep preprocessing.py:148-150) is folded in here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from avid_cma_tpu.ops.stft import log_spectrogram
from avid_cma_tpu.ops.video_aug import (
    augment_clips_eval,
    augment_clips_train,
    crop_augment_clips_eval,
    crop_augment_clips_train,
)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    # which reference video front-end: 'msc+color' = VideoPrep_MSC_CJ
    # (random-resized-crop), 'crop+color' = VideoPrep_Crop_CJ (exact
    # Resize(resize) + RandomCrop) — the dispatch mirrored from
    # utils/eval_utils.py:70-86 / utils/main_utils.py:151-165
    transform: str = "msc+color"
    crop_size: int = 224
    min_area: float = 0.08
    color: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 0.2)
    # Crop_CJ exact-resize target (reference VideoPrep_Crop_CJ default,
    # preprocessing.py:64)
    resize: Tuple[int, int] = (256, 256)
    # jitter op order: 'random' = per-clip shuffled like the reference
    # (video_transforms.py:462) — EXACT distribution parity, but under
    # vmap every lax.switch step evaluates all four ops, costing ~8% of
    # flagship-step throughput (PERF.md A/B); 'canonical' = fixed
    # b->c->s->h order (an aug-order permutation, expected metric-
    # neutral; A/B harness: scripts/learning_proof.py --jitter-order;
    # PARITY.md divergence #1). Default: the fast one.
    jitter_order: str = "canonical"
    audio_fps: int = 24000
    n_fft: int = 512
    spectrogram_fps: float = 100.0
    audio_clip_duration: float = 2.0
    volume_jitter: float = 0.1
    normalize_spectrogram: bool = True
    # 'auto': fused Pallas kernel on TPU, XLA path elsewhere
    spectrogram_backend: str = "auto"  # auto | pallas | xla
    # augmentation compute dtype: 'auto' = bfloat16 on TPU (halves the
    # HBM traffic of the crop/jitter chain; bf16 mantissa matches the
    # 8-bit source), float32 elsewhere (reference-parity tests run there)
    video_dtype: str = "auto"  # auto | float32 | bfloat16

    @property
    def hop_size(self) -> float:
        return 1.0 / self.spectrogram_fps

    def use_pallas(self) -> bool:
        if self.spectrogram_backend == "pallas":
            return True
        if self.spectrogram_backend == "xla":
            return False
        return jax.default_backend() not in ("cpu",)

    def resolve_video_dtype(self):
        if self.video_dtype == "float32":
            return jnp.float32
        if self.video_dtype == "bfloat16":
            return jnp.bfloat16
        return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


@partial(jax.jit, static_argnames=("cfg", "train"))
def preprocess_batch(
    key: jax.Array,
    batch: Dict[str, jnp.ndarray],
    cfg: PreprocessConfig,
    train: bool = True,
) -> Dict[str, jnp.ndarray]:
    """{frames: uint8 (B,T,H,W,C), audio: f32 (B,L), ...} ->
    {frames: f32 (B,T,S,S,C), audio: f32 (B,T',F,1), ...}."""
    if cfg.transform not in ("msc+color", "crop+color"):
        # fail LOUDLY: a silently-ignored transform value is how the
        # crop+color branch went missing for four rounds (the reference
        # raises on unknown values too, utils/eval_utils.py:86-87)
        raise ValueError(
            f"unknown transform {cfg.transform!r}: "
            "expected 'msc+color' or 'crop+color'"
        )
    out = dict(batch)
    k_vid, k_vol = jax.random.split(key)
    if "frames" in batch:
        vdtype = cfg.resolve_video_dtype()
        if train and cfg.transform == "crop+color":
            out["frames"] = crop_augment_clips_train(
                k_vid,
                batch["frames"],
                crop_size=cfg.crop_size,
                resize=cfg.resize,
                color=cfg.color,
                dtype=vdtype,
                jitter_order=cfg.jitter_order,
            )
        elif train:
            out["frames"] = augment_clips_train(
                k_vid,
                batch["frames"],
                crop_size=cfg.crop_size,
                min_area=cfg.min_area,
                color=cfg.color,
                dtype=vdtype,
                jitter_order=cfg.jitter_order,
            )
        elif cfg.transform == "crop+color":
            out["frames"] = crop_augment_clips_eval(
                batch["frames"],
                crop_size=cfg.crop_size,
                resize=cfg.resize,
                dtype=vdtype,
            )
        else:
            out["frames"] = augment_clips_eval(
                batch["frames"], crop_size=cfg.crop_size, dtype=vdtype
            )
    if "audio" in batch:
        wav = batch["audio"]
        if train and cfg.volume_jitter > 0:
            vol = jax.random.uniform(
                k_vol,
                (wav.shape[0], 1),
                minval=1.0 - cfg.volume_jitter,
                maxval=1.0 + cfg.volume_jitter,
            )
            wav = wav * vol
        if cfg.use_pallas():
            from avid_cma_tpu.ops.pallas.spectrogram import log_spectrogram_pallas

            out["audio"] = log_spectrogram_pallas(
                wav,
                sample_rate=cfg.audio_fps,
                n_fft=cfg.n_fft,
                hop_size=cfg.hop_size,
                duration=cfg.audio_clip_duration,
                normalize=cfg.normalize_spectrogram,
            )
        else:
            out["audio"] = log_spectrogram(
                wav,
                sample_rate=cfg.audio_fps,
                n_fft=cfg.n_fft,
                hop_size=cfg.hop_size,
                duration=cfg.audio_clip_duration,
                normalize=cfg.normalize_spectrogram,
            )
    return out
