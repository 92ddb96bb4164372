"""Audio frontend golden tests: STFT vs torch.stft (independent
implementation), power_to_db vs the librosa formula, frequency fold, and
the full LogSpectrogram pipeline shape/stat contract
(reference: datasets/preprocessing.py:158-187)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from avid_cma_tpu.ops.stft import (
    frame_signal,
    hann_periodic,
    load_norm_stats,
    log_spectrogram,
    power_to_db,
    stft_power,
)


def test_stft_power_matches_torch(rng):
    """|STFT|^2 must match torch.stft with center=True reflect padding and
    a periodic Hann window (the librosa defaults the reference relies on)."""
    sr, n_fft, hop = 24000, 512, 120
    sig = rng.normal(size=(2, 12000)).astype(np.float32)

    frames = frame_signal(jnp.asarray(sig), n_fft * 2, hop)
    window = hann_periodic(n_fft * 2)
    ours = np.asarray(stft_power(frames, window))  # (B,T,F)

    t_spec = torch.stft(
        torch.from_numpy(sig),
        n_fft=n_fft * 2,
        hop_length=hop,
        window=torch.hann_window(n_fft * 2, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    theirs = (t_spec.abs() ** 2).numpy().transpose(0, 2, 1)  # (B,T,F)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_power_to_db_formula(rng):
    s = rng.uniform(1e-12, 10.0, size=(1, 8, 16)).astype(np.float32)
    got = np.asarray(power_to_db(jnp.asarray(s), top_db=100.0))
    want = 10.0 * np.log10(np.maximum(s, 1e-10))
    want = np.maximum(want, want.max(axis=(-2, -1), keepdims=True) - 100.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_log_spectrogram_shape_and_trim():
    """Kinetics config: 2 s @ 24 kHz, n_fft 512, fps 100 -> (B,200,257,1)
    (configs/main/avid/kinetics/Cross-N1024.yaml dataset block)."""
    sig = jnp.asarray(np.sin(np.linspace(0, 1000, 48000, dtype=np.float32)))[None]
    out = log_spectrogram(sig, 24000, 512, hop_size=0.01, duration=2.0)
    assert out.shape == (1, 200, 257, 1)


def test_log_spectrogram_fold_and_normalize(rng):
    """The fold keeps DC and averages adjacent pairs; normalization uses
    the bundled per-bin stats (preprocessing.py:176,184-186)."""
    sr, n_fft = 24000, 512
    sig = jnp.asarray(rng.normal(size=(1, 24000)).astype(np.float32))
    raw = log_spectrogram(sig, sr, n_fft, hop_size=0.01, duration=1.0, normalize=False)
    normed = log_spectrogram(sig, sr, n_fft, hop_size=0.01, duration=1.0, normalize=True)
    mean, std = load_norm_stats(n_fft, sr)
    want = (np.asarray(raw)[..., 0] - mean) / (std + 1e-5)
    np.testing.assert_allclose(np.asarray(normed)[..., 0], want, rtol=1e-4, atol=1e-5)
    assert raw.shape[2] == n_fft // 2 + 1


def test_norm_stats_unavailable_combo():
    with pytest.raises(ValueError):
        load_norm_stats(128, 16000)


def test_frame_count_truncation_matches_reference():
    """num_frames = int(duration * (1/hop)) — the reference computes
    spectrogram_fps first (preprocessing.py:163,183); direct division
    truncates differently for ~1% of durations (0.47/0.005 -> 93 vs 94)."""
    assert int(0.47 / 0.005) == 93  # the bug this guards against
    sig = jnp.asarray(np.random.default_rng(0).standard_normal(24000),
                      jnp.float32)[None]
    out = log_spectrogram(sig, 24000, 512, hop_size=0.005, duration=0.47,
                          normalize=False)
    assert out.shape[1] == 94
