"""On-device video augmentation: clip-consistent random-resized-crop,
horizontal flip, color jitter, ImageNet normalization — all jitted,
operating on uint8/float batches (B, T, H, W, C).

Capability reference: datasets/preprocessing.py:15-113 (VideoPrep_MSC_CJ /
VideoPrep_Crop_CJ) built from utils/videotransforms/*:
  * RandomResizedCrop(scale=(min_area,1), ratio=(3/4,4/3)) with ONE crop
    box per clip (video_transforms.py:303-382)
  * RandomHorizontalFlip (video_transforms.py:73)
  * ColorJitter(brightness, contrast, saturation, hue) with the same
    factors for every frame of a clip (video_transforms.py:393-475)
  * ClipToTensor /255 + ImageNet mean/std normalize (volume_transforms,
    tensor_transforms)
  * eval path: short-side Resize(crop/0.875) + CenterCrop

Intentional divergence (documented): the reference applies the four
jitter ops in a random order per clip; on device we use the canonical
(brightness, contrast, saturation, hue) order — a per-clip random order
costs 24 predicated branches under vmap for a statistically negligible
effect. The reference also swaps PIL interpolation flags ('bilinear' ->
NEAREST, functional.py:58-61) — a bug we do not reproduce: resizes here
are true bilinear.

TPU-first: crops are `scale_and_translate` (no dynamic shapes), the whole
pipeline fuses into the step's first conv under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _sample_crop_box(
    key: jax.Array,
    h: int,
    w: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    attempts: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """torchvision-style RandomResizedCrop box sampling, branchless:
    `attempts` candidate boxes are drawn; the first valid one is used,
    falling back to a max-area center crop (video_transforms.py:317-366).
    Returns (top, left, crop_h, crop_w) as f32 scalars."""
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = h * w
    target_area = area * jax.random.uniform(
        k_area, (attempts,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio,
        (attempts,),
        minval=jnp.log(ratio[0]),
        maxval=jnp.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    crop_w = jnp.sqrt(target_area * aspect)
    crop_h = jnp.sqrt(target_area / aspect)
    valid = (crop_w <= w) & (crop_h <= h)
    # first valid attempt (argmax of bool picks first True)
    first = jnp.argmax(valid)
    any_valid = jnp.any(valid)

    # fallback: center crop at the max feasible size with a valid ratio
    in_ratio = w / h
    fb_w = jnp.where(
        in_ratio < ratio[0], float(w), jnp.where(in_ratio > ratio[1], h * ratio[1], w)
    )
    fb_h = jnp.where(
        in_ratio < ratio[0], w / ratio[0], jnp.where(in_ratio > ratio[1], float(h), h)
    )
    c_w = jnp.where(any_valid, crop_w[first], fb_w)
    c_h = jnp.where(any_valid, crop_h[first], fb_h)

    u_top = jax.random.uniform(k_top)
    u_left = jax.random.uniform(k_left)
    top = jnp.where(any_valid, u_top * (h - c_h), (h - c_h) / 2.0)
    left = jnp.where(any_valid, u_left * (w - c_w), (w - c_w) / 2.0)
    return top, left, c_h, c_w


def _crop_resize_clip(
    clip: jnp.ndarray,
    top: jnp.ndarray,
    left: jnp.ndarray,
    crop_h: jnp.ndarray,
    crop_w: jnp.ndarray,
    out_size: Tuple[int, int],
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Bilinear crop+resize of (T, H, W, C) via scale_and_translate
    (static output shape, dynamic box)."""
    t, h, w, c = clip.shape
    oh, ow = out_size
    # geometry stays f32: translations reach O(h * scale) ~ 1e3 where the
    # bf16 ulp is 4-8 — casting them to the compute dtype would quantize
    # the crop origin by whole pixels, collapsing sub-pixel crop
    # diversity. Only the IMAGE (the HBM traffic) is cast.
    scale_y = (oh / crop_h).astype(jnp.float32)
    scale_x = (ow / crop_w).astype(jnp.float32)
    translation = jnp.stack(
        [-top * scale_y, -left * scale_x]
    ).astype(jnp.float32)
    return jax.image.scale_and_translate(
        clip.astype(dtype),
        shape=(t, oh, ow, c),
        spatial_dims=(1, 2),
        scale=jnp.stack([scale_y, scale_x]),
        translation=translation,
        method="bilinear",
    )


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    conds = [
        (v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q),
    ]
    r = jnp.select([i == k for k in range(6)], [c[0] for c in conds])
    g = jnp.select([i == k for k in range(6)], [c[1] for c in conds])
    b = jnp.select([i == k for k in range(6)], [c[2] for c in conds])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter_clip(
    key: jax.Array,
    clip: jnp.ndarray,
    brightness: float,
    contrast: float,
    saturation: float,
    hue: float,
) -> jnp.ndarray:
    """Clip-consistent color jitter on float RGB in [0,1]
    (video_transforms.py:438-475; factors sampled once per clip)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    # factors are cast to the clip dtype: jax.random.uniform returns a
    # STRONG f32 scalar, and bf16 * f32 promotes — without the cast the
    # whole jitter chain (incl. both HSV conversions) silently runs at
    # full-res f32, doubling its HBM traffic
    if brightness > 0:
        f = jax.random.uniform(
            kb, minval=max(0.0, 1 - brightness), maxval=1 + brightness
        ).astype(clip.dtype)
        clip = jnp.clip(clip * f, 0.0, 1.0)
    if contrast > 0:
        f = jax.random.uniform(
            kc, minval=max(0.0, 1 - contrast), maxval=1 + contrast
        ).astype(clip.dtype)
        # PIL Contrast: blend each FRAME with its own mean-luminance gray
        # (torchvision adjust_contrast is per-image; a whole-clip mean
        # would shift every frame of a clip with changing brightness)
        lum = jnp.mean(
            0.299 * clip[..., 0] + 0.587 * clip[..., 1] + 0.114 * clip[..., 2],
            axis=(-2, -1), keepdims=True,
        )[..., None]
        clip = jnp.clip((clip - lum) * f + lum, 0.0, 1.0)
    if saturation > 0:
        f = jax.random.uniform(
            ks, minval=max(0.0, 1 - saturation), maxval=1 + saturation
        ).astype(clip.dtype)
        gray = (
            0.299 * clip[..., 0] + 0.587 * clip[..., 1] + 0.114 * clip[..., 2]
        )[..., None]
        clip = jnp.clip((clip - gray) * f + gray, 0.0, 1.0)
    if hue > 0:
        f = jax.random.uniform(kh, minval=-hue, maxval=hue).astype(clip.dtype)
        hsv = _rgb_to_hsv(clip)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + f) % 1.0)
        clip = _hsv_to_rgb(hsv)
    return clip


def normalize_clip(clip: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization of float RGB in [0,1]
    (tensor_transforms.Normalize; preprocessing.py:47-49)."""
    mean = jnp.asarray(IMAGENET_MEAN, clip.dtype)
    std = jnp.asarray(IMAGENET_STD, clip.dtype)
    return (clip - mean) / std


def augment_clips_train(
    key: jax.Array,
    frames: jnp.ndarray,
    crop_size: int = 224,
    min_area: float = 0.08,
    color: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 0.2),
    flip: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Training path of VideoPrep_MSC_CJ (preprocessing.py:33-49) for a
    uint8 batch (B, T, H, W, C) -> normalized float (B, T, S, S, C).

    dtype=bfloat16 runs the whole augmentation chain at half the HBM
    traffic; bf16's 8-bit mantissa matches the 8-bit source frames, so
    no information is lost vs the reference's uint8 PIL pipeline."""
    b = frames.shape[0]
    keys = jax.random.split(key, b)

    def one(key, clip):
        k_box, k_flip, k_jit = jax.random.split(key, 3)
        top, left, ch, cw = _sample_crop_box(
            k_box, clip.shape[1], clip.shape[2], (min_area, 1.0)
        )
        out = _crop_resize_clip(
            clip, top, left, ch, cw, (crop_size, crop_size), dtype=dtype
        )
        out = out / 255.0
        if flip:
            do = jax.random.bernoulli(k_flip)
            out = jnp.where(do, out[:, :, ::-1, :], out)
        out = color_jitter_clip(k_jit, out, *color)
        return normalize_clip(out)

    return jax.vmap(one)(keys, frames)


def augment_clips_eval(
    frames: jnp.ndarray,
    crop_size: int = 224,
    resize: Optional[int] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Eval path: short-side Resize(crop/0.875) + CenterCrop + normalize
    (preprocessing.py:40-43)."""
    b, t, h, w, c = frames.shape
    resize = resize if resize is not None else int(crop_size / 0.875)
    # reference truncation: the long side is int(size * long / short)
    # (get_resize_sizes, videotransforms/functional.py:69) — round()
    # lands one pixel larger for ~half of all aspect ratios and shifts
    # the center crop by a row/column vs the reference
    if w < h:
        nw, nh = resize, int(resize * h / w)
    else:
        nh, nw = resize, int(resize * w / h)
    out = jax.image.resize(
        frames.astype(dtype), (b, t, nh, nw, c), method="bilinear"
    )
    top = (nh - crop_size) // 2
    left = (nw - crop_size) // 2
    out = out[:, :, top : top + crop_size, left : left + crop_size, :]
    return normalize_clip(out / 255.0)
