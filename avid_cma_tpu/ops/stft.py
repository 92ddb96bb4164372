"""On-device audio frontend: STFT -> power -> frequency fold -> dB ->
per-bin normalization, fully jitted.

Capability reference: datasets/preprocessing.py:158-187 (LogSpectrogram):
  * librosa.stft(sig, n_fft=2*n_fft, hop=int(hop_size*sr)) -> |.|^2
  * frequency fold: keep DC, average adjacent bin pairs -> n_fft//2+1 bins
  * librosa.power_to_db(top_db=100): 10*log10(max(S,1e-10)) clamped to
    [max-100, max] (max over the whole spectrogram)
  * per-bin (mean, std+1e-5) normalization from the bundled stats

TPU-first: the host decodes waveforms; everything from framing onward is
jnp (VPU/MXU) — framing is a static gather, the DFT an rfft (or the
Pallas framed-matmul kernel in ops/pallas), the rest fused elementwise.
Replaces librosa (unavailable on the host anyway) with bit-comparable math.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


@functools.lru_cache(maxsize=None)
def load_norm_stats(n_fft: int, sample_rate: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-bin normalization stats (reference: preprocessing.py:167-171)."""
    name = {
        (512, 24000): "audio-spectDB-24k-513-norm-stats.npz",
        (256, 24000): "audio-spectDB-24k-257-norm-stats.npz",
    }.get((n_fft, sample_rate))
    if name is None:
        raise ValueError(f"no norm stats for n_fft={n_fft}, sr={sample_rate}")
    d = np.load(os.path.join(_ASSET_DIR, name))
    return d["mean"].astype(np.float32), d["std"].astype(np.float32)


def hann_periodic(n: int) -> jnp.ndarray:
    """Periodic Hann window (librosa/scipy fftbins=True default)."""
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n))


def frame_signal(sig: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Center-padded (reflect) framing: (..., L) -> (..., T, frame_len)
    with T = 1 + L // hop, matching librosa center=True."""
    pad = frame_len // 2
    sig = jnp.pad(
        sig,
        [(0, 0)] * (sig.ndim - 1) + [(pad, pad)],
        mode="reflect",
    )
    n_frames = 1 + (sig.shape[-1] - 2 * pad) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return sig[..., idx]


@functools.lru_cache(maxsize=None)
def _dft_matrices(frame_len: int):
    """Real-DFT bases: (frame_len, F) cosine and sine matrices with
    F = frame_len//2 + 1. The DFT-as-matmul formulation maps the STFT
    onto the MXU (a (T, frame_len) @ (frame_len, F) matmul) instead of an
    FFT custom call, which the TPU runtime lacks.

    Cached as NUMPY (converting under a jit trace would cache a tracer)."""
    n = np.arange(frame_len)[:, None]
    k = np.arange(frame_len // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / frame_len
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_power(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """|DFT(frames * window)|^2 via two real matmuls: (..., T, L) ->
    (..., T, L//2+1)."""
    cos_np, sin_np = _dft_matrices(frames.shape[-1])
    cos_m = jnp.asarray(cos_np, frames.dtype)
    sin_m = jnp.asarray(sin_np, frames.dtype)
    x = frames * window
    re = jnp.matmul(x, cos_m, precision=precision)
    im = jnp.matmul(x, sin_m, precision=precision)
    return re * re + im * im


def power_to_db(
    spect: jnp.ndarray, top_db: float = 100.0, amin: float = 1e-10
) -> jnp.ndarray:
    """librosa.core.power_to_db with ref=1.0 (preprocessing.py:182).
    The top_db clamp is relative to the per-sample max over (T, F)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(spect, amin))
    if top_db is not None:
        max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, max_val - top_db)
    return log_spec


def log_spectrogram(
    sig: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 512,
    hop_size: float = 0.005,
    duration: Optional[float] = None,
    normalize: bool = True,
    norm_stats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    top_db: float = 100.0,
) -> jnp.ndarray:
    """(B, L) mono waveform -> (B, T, F, 1) normalized log-power
    spectrogram (F = n_fft//2 + 1). Matches LogSpectrogram.__call__
    (preprocessing.py:173-187); output is channels-last (reference emits
    (1, T, F))."""
    frame_len = n_fft * 2
    hop = int(hop_size * sample_rate)
    frames = frame_signal(sig, frame_len, hop)  # (B, T, frame_len)
    window = hann_periodic(frame_len).astype(frames.dtype)
    power = stft_power(frames, window)  # (B, T, n_fft+1)

    # frequency fold: DC + mean of adjacent pairs (preprocessing.py:176)
    dc = power[..., :1]
    rest = power[..., 1:].reshape(*power.shape[:-1], n_fft // 2, 2).mean(-1)
    power = jnp.concatenate([dc, rest], axis=-1)  # (B, T, F)

    if duration is not None:
        # int(duration * (1/hop)) — NOT int(duration / hop): the reference
        # computes spectrogram_fps = 1/hop first (preprocessing.py:163,183)
        # and the two truncate differently for ~1% of durations (e.g.
        # 0.47/0.005: direct division truncates to 93, reference gets 94)
        num_frames = int(duration * (1.0 / hop_size))
        power = power[:, :num_frames]

    db = power_to_db(power, top_db=top_db)

    if normalize:
        if norm_stats is None:
            mean, std = load_norm_stats(n_fft, sample_rate)
        else:
            mean, std = norm_stats
        db = (db - jnp.asarray(mean)) / (jnp.asarray(std) + 1e-5)

    return db[..., None]  # (B, T, F, 1)
