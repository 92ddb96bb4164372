"""Pallas TPU kernel: fused log-power spectrogram.

Fuses the whole audio frontend (datasets/preprocessing.py:158-187 in the
reference; ops/stft.py here) into ONE kernel per sample:

    windowed frames --MXU--> re/im DFT matmuls --VPU--> power
    -> frequency fold -> dB (with per-sample top_db clamp) -> normalize

The XLA path materializes the (T, F) power, dB and normalized arrays in
HBM between fusions; here everything after the frame gather stays in
VMEM: per sample that is T*1024*4 in, T*257*4 out, zero intermediate HBM
traffic. Grid = (batch,); each program owns one sample's full (T, 1024)
frame block (~824 KB for the Kinetics recipe, well inside VMEM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avid_cma_tpu.ops.stft import (
    _dft_matrices,
    frame_signal,
    hann_periodic,
    load_norm_stats,
)


@functools.lru_cache(maxsize=None)
def _fold_matrix(n_fft: int) -> np.ndarray:
    """(n_fft+1, n_fft//2+1) matrix expressing the frequency fold (keep
    DC, average adjacent bin pairs) as a matmul — Mosaic has no 3-D
    reshape on the lane axis, and the MXU does this for free."""
    f_in, f_out = n_fft + 1, n_fft // 2 + 1
    m = np.zeros((f_in, f_out), np.float32)
    m[0, 0] = 1.0
    for k in range(1, f_out):
        m[2 * k - 1, k] = 0.5
        m[2 * k, k] = 0.5
    return m


def _spectrogram_kernel(
    frames_ref,  # (1, T, L) VMEM
    window_ref,  # (1, L)    VMEM
    cos_ref,     # (L, F)    VMEM
    sin_ref,     # (L, F)    VMEM
    fold_ref,    # (F, Fout) VMEM
    mean_ref,    # (1, Fout) VMEM
    std_ref,     # (1, Fout) VMEM
    out_ref,     # (1, T, Fout) VMEM
    *,
    top_db: Optional[float],
    normalize: bool,
):
    # HIGHEST precision: the log10 amplifies bf16 rounding of small
    # power values into visible dB errors
    hp = jax.lax.Precision.HIGHEST
    x = frames_ref[0] * window_ref[0][None, :]  # (T, L)
    re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32, precision=hp)
    im = jnp.dot(x, sin_ref[:], preferred_element_type=jnp.float32, precision=hp)
    power = re * re + im * im  # (T, F) with F = n_fft + 1

    folded = jnp.dot(power, fold_ref[:], preferred_element_type=jnp.float32,
                     precision=hp)

    db = 10.0 * jnp.log10(jnp.maximum(folded, 1e-10))
    if top_db is not None:  # None: unclamped (ops/stft.py power_to_db)
        mx = jnp.max(db)
        db = jnp.maximum(db, mx - top_db)

    if normalize:
        db = (db - mean_ref[0][None, :]) / (std_ref[0][None, :] + 1e-5)
    out_ref[0] = db


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_size", "duration",
                     "normalize", "top_db", "interpret"),
)
def log_spectrogram_pallas(
    sig: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 512,
    hop_size: float = 0.005,
    duration: Optional[float] = None,
    normalize: bool = True,
    top_db: Optional[float] = 100.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.stft.log_spectrogram: (B, L) -> (B, T, F, 1)."""
    frame_len = n_fft * 2
    hop = int(hop_size * sample_rate)
    frames = frame_signal(sig, frame_len, hop).astype(jnp.float32)
    if duration is not None:
        # int(duration * (1/hop)), matching ops/stft.py (reference
        # truncation order, preprocessing.py:163,183)
        frames = frames[:, : int(duration * (1.0 / hop_size))]
    b, t, _ = frames.shape
    f_out = n_fft // 2 + 1

    window = hann_periodic(frame_len).astype(jnp.float32)[None, :]
    cos_np, sin_np = _dft_matrices(frame_len)
    if normalize:
        mean, std = load_norm_stats(n_fft, sample_rate)
    else:
        mean = np.zeros(f_out, np.float32)
        std = np.ones(f_out, np.float32)

    kernel = functools.partial(
        _spectrogram_kernel, top_db=top_db, normalize=normalize
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, frame_len), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, frame_len), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_len, n_fft + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_len, n_fft + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft + 1, f_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, f_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, f_out), jnp.float32),
        interpret=interpret,
    )(
        frames,
        window,
        jnp.asarray(cos_np),
        jnp.asarray(sin_np),
        jnp.asarray(_fold_matrix(n_fft)),
        jnp.asarray(mean)[None, :],
        jnp.asarray(std)[None, :],
    )
    return out[..., None]
