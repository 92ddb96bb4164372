"""MXU-shaped 3D convolutions for the R(2+1)D hot path.

XLA's direct NDHWC 3D-conv lowering on TPU is slow for this model's
factorized kernels (measured on v5e, batch 32, 224^2 flagship shape):
the (3,7,7) stem runs at ~15 TF/s and the (1,3,3)/(3,1,1) stage convs at
16-18 / 6-8 TF/s. Reformulating the same math as 2D convs recovers a
large factor:

  * kt>1, kh>1 (full-3D stem, reference models/video.py:19-21): stack
    the kt temporal taps into input channels (C -> kt*C) and run ONE 2D
    conv over (B*T, H, W, kt*C) — measured 1.45x the direct 3D form.
  * kt==1 (spatial conv of the factorized block,
    reference models/network_blocks.py:38-44): fold T into the batch and
    run a plain 2D conv.
  * kh==kw==1, kt>1 (temporal conv): XLA's 3D form is the best of the
    formulations measured (stacked matmul and folded-2D are slower);
    kept as conv_general_dilated.
  * 1x1x1 (projection residual): a single matmul.

All variants are exact reformulations (identical math, same bf16
rounding class); parameters are stored in flax nn.Conv layout
(kt, kh, kw, C_in, C_out) under the name 'kernel', so modules here are
drop-in replacements inside existing checkpoints.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# Per-geometry formulation switches (trace-time). Values: the fast path
# name or 'xla3d' (direct conv_general_dilated). Used for in-graph A/B
# measurement; defaults hold the formulation that wins inside the full
# fused train-step program on v5e, NOT the one that wins in isolation.
FORMS = {
    "stem": "xla3d",     # s2d | tstack | xla3d
    "spatial": "xla3d",  # fold2d | xla3d
    "temporal": "xla3d",  # xla3d (stacked-matmul and folded-2D measured slower)
    "proj": "xla3d",     # matmul | xla3d
}
# In-graph A/B on the FULL fused train step (v5e, b32, 224^2, bf16,
# clips/s; the chip is time-sliced so only same-session numbers are
# comparable). Session A: all-xla3d 459.0 | stem=tstack 454.3 |
# spatial=fold2d 339.6 | proj=matmul 454.7 | all-alternates 332.6.
# Session B: all-xla3d 468.5 | stem=s2d 451.9. Full log: PERF.md.
# Isolated-op microbenchmarks show the opposite ordering (tstack 1.4x,
# fold2d 1.1x): XLA already picks good layouts inside the big program
# (the stem uses the input-feature-packed-in-sublanes emitter, and BN
# stats fuse into the conv output), and the fold/stack/space-to-depth
# reshapes defeat those fusions. Defaults therefore stay on xla3d.


def _conv3d_direct(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _conv2d(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3d_tstack(x: jnp.ndarray, w: jnp.ndarray,
                  strides: Tuple[int, int, int],
                  padding: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Full-3D conv via temporal-tap channel stacking + one 2D conv.

    x: (B, T, H, W, C); w: (kt, kh, kw, C, F). Temporal stride must be 1
    (the stem's case). out[b,t] = sum_dt conv2d(x[b, t+dt-pt], w[dt])."""
    b, t, h, wd, c = x.shape
    kt = w.shape[0]
    st, sh, sw = strides
    (pt0, pt1), ph, pw = padding[0], padding[1], padding[2]
    assert st == 1, "temporal stride handled by the caller"
    xp = jnp.pad(x, ((0, 0), (pt0, pt1), (0, 0), (0, 0), (0, 0)))
    xs = jnp.concatenate([xp[:, dt : dt + t] for dt in range(kt)], axis=-1)
    w2 = jnp.concatenate([w[dt] for dt in range(kt)], axis=2)  # (kh,kw,kt*C,F)
    out = _conv2d(xs.reshape(b * t, h, wd, kt * c), w2, (sh, sw), [ph, pw])
    return out.reshape(b, t, out.shape[1], out.shape[2], -1)


def conv3d_s2d(x: jnp.ndarray, w: jnp.ndarray,
               strides: Tuple[int, int, int],
               padding: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Space-to-depth reformulation of the stem conv (kh=kw odd, spatial
    stride 2, SAME padding, even H/W).

    The (3,7,7)/s(1,2,2) stem conv runs at ~13 TF/s on the MXU because
    C_in=3 leaves the systolic array's input-feature dimension nearly
    empty. Packing each 2x2 spatial block into channels (C -> 4C = 12)
    and turning the conv into (3,4,4)/s(1,1,1) is the standard TPU fix
    (same multiply-adds, 4x the input-feature occupancy).

    Identity: out[h] = sum_u w[u] x[2h+u-p] with p=k//2. Zero-padding
    the kernel to k+1 taps (front when p is odd, back when even) and
    splitting even/odd gives wk[j, ph] = wp[2j+ph], a ((k+1)/2)-tap
    stride-1 conv over the s2d grid with padding (ceil(p/2),
    K'-1-ceil(p/2)). Applied independently to H and W. Parameters stay
    in the reference (kt,kh,kw,C,F) layout; the transform is traced, so
    gradients land in the original layout exactly.
    """
    b, t, h, wd, c = x.shape
    kt, kh, kw = w.shape[:3]
    f = w.shape[-1]
    xs = (
        x.reshape(b, t, h // 2, 2, wd // 2, 2, c)
        .transpose(0, 1, 2, 4, 3, 5, 6)
        .reshape(b, t, h // 2, wd // 2, 4 * c)
    )
    k_h, k_w = (kh + 1) // 2, (kw + 1) // 2
    p_h, p_w = kh // 2, kw // 2
    wp = jnp.pad(
        w,
        (
            (0, 0),
            (1, 0) if p_h % 2 == 1 else (0, 1),
            (1, 0) if p_w % 2 == 1 else (0, 1),
            (0, 0),
            (0, 0),
        ),
    )
    wk = (
        wp.reshape(kt, k_h, 2, k_w, 2, c, f)
        .transpose(0, 1, 3, 2, 4, 5, 6)
        .reshape(kt, k_h, k_w, 4 * c, f)
    )
    ph_l = (p_h + 1) // 2
    pw_l = (p_w + 1) // 2
    return jax.lax.conv_general_dilated(
        xs, wk,
        window_strides=(strides[0], 1, 1),
        padding=[padding[0], (ph_l, k_h - 1 - ph_l), (pw_l, k_w - 1 - pw_l)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _s2d_applicable(x, w, strides, padding) -> bool:
    kt, kh, kw = w.shape[:3]
    return (
        strides[1] == 2 and strides[2] == 2
        and kh % 2 == 1 and kw % 2 == 1
        and tuple(padding[1]) == (kh // 2, kh // 2)
        and tuple(padding[2]) == (kw // 2, kw // 2)
        and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0
    )


def conv3d_spatial(x: jnp.ndarray, w: jnp.ndarray,
                   strides: Tuple[int, int, int],
                   padding: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """kt==1 conv: fold T into batch, one 2D conv."""
    b, t, h, wd, c = x.shape
    sh, sw = strides[1], strides[2]
    out = _conv2d(x.reshape(b * t, h, wd, c), w[0], (sh, sw),
                  [padding[1], padding[2]])
    return out.reshape(b, t, out.shape[1], out.shape[2], -1)


def conv3d_temporal(x: jnp.ndarray, w: jnp.ndarray,
                    strides: Tuple[int, int, int],
                    padding: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """kh==kw==1 conv: XLA's 3D lowering is the fastest measured form."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_1x1(x: jnp.ndarray, w: jnp.ndarray,
               strides: Tuple[int, int, int]) -> jnp.ndarray:
    """1x1x1 projection: strided slice + matmul."""
    st, sh, sw = strides
    xs = x[:, ::st, ::sh, ::sw, :]
    b, t, h, wd, c = xs.shape
    out = jnp.dot(xs.reshape(-1, c), w.reshape(c, -1))
    return out.reshape(b, t, h, wd, -1)


class Conv3D(nn.Module):
    """Drop-in for nn.Conv over (B,T,H,W,C) picking the MXU-shaped
    formulation per kernel geometry. Parameter layout/name identical to
    flax nn.Conv ((kt,kh,kw,Cin,F) under 'kernel', no bias)."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Sequence[Tuple[int, int]] | None = None  # None = VALID
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kt, kh, kw, c_in, self.features),
        )
        dtype = self.dtype or kernel.dtype
        x = x.astype(dtype)
        w = kernel.astype(dtype)
        pad = self.padding or [(0, 0)] * 3

        # each alternate formulation guards the geometry it actually
        # handles and falls back to XLA's direct form otherwise — the
        # FORMS switch may only change speed, never the math
        if kt == 1 and kh == 1 and kw == 1:
            if FORMS["proj"] == "matmul" and all(
                tuple(p) == (0, 0) for p in pad
            ):  # conv3d_1x1 is a strided slice + matmul; it has no
                # padding path
                return conv3d_1x1(x, w, self.strides)
            return _conv3d_direct(x, w, self.strides, pad)
        if kt == 1:
            if (
                FORMS["spatial"] == "fold2d"
                and self.strides[0] == 1
                and tuple(pad[0]) == (0, 0)
            ):  # fold2d folds T into batch: temporal stride/padding
                # would silently vanish
                return conv3d_spatial(x, w, self.strides, pad)
            return _conv3d_direct(x, w, self.strides, pad)
        if kh == 1 and kw == 1:
            return conv3d_temporal(x, w, self.strides, pad)
        # full 3D (stem). Temporal stride 1 in every reference config;
        # fall back to XLA's direct form otherwise.
        if FORMS["stem"] == "s2d" and _s2d_applicable(x, w, self.strides, pad):
            return conv3d_s2d(x, w, self.strides, pad)
        if (
            FORMS["stem"] == "tstack"
            and self.strides[0] == 1
            and pad[0][0] + pad[0][1] == kt - 1
        ):  # tstack shifts T taps in place: it assumes SAME-style
            # temporal padding (over/under-padding would drop or corrupt
            # output frames)
            return conv3d_tstack(x, w, self.strides, pad)
        return _conv3d_direct(x, w, self.strides, pad)


class Conv1x1x1(nn.Module):
    """1x1x1 projection residual as a strided matmul (nn.Conv layout)."""

    features: int
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 1, c_in, self.features),
        )
        dtype = self.dtype or kernel.dtype
        x = x.astype(dtype)
        w = kernel.astype(dtype)
        if FORMS["proj"] == "matmul":
            return conv3d_1x1(x, w, self.strides)
        return _conv3d_direct(x, w, self.strides, [(0, 0)] * 3)
