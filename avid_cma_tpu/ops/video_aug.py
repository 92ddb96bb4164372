"""On-device video augmentation: clip-consistent random-resized-crop or
resize+random-crop, horizontal flip, color jitter, ImageNet
normalization — all jitted, operating on uint8/float batches
(B, T, H, W, C).

Capability reference: datasets/preprocessing.py:15-113 (VideoPrep_MSC_CJ /
VideoPrep_Crop_CJ) built from utils/videotransforms/*:
  * RandomResizedCrop(scale=(min_area,1), ratio=(3/4,4/3)) with ONE crop
    box per clip, integer-grid box sampling (video_transforms.py:303-382)
  * Crop_CJ train branch: exact (aspect-distorting) Resize(resize) +
    integer-grid RandomCrop (video_transforms.py:159-270,
    preprocessing.py:83-90) — selected by `transform: crop+color`
    (utils/eval_utils.py:79-86, the Kinetics linear probe)
  * RandomHorizontalFlip (video_transforms.py:73)
  * ColorJitter(brightness, contrast, saturation, hue) with the same
    factors for every frame of a clip, the ops applied in a RANDOM ORDER
    per clip (video_transforms.py:438-475) — implemented in-graph as a
    per-step `lax.switch` over the active ops (`order="random"`, the
    exact distribution-parity mode; ~8% of flagship-step throughput
    because vmap evaluates every branch). Default "canonical" applies
    the fixed b->c->s->h order — an aug-order permutation, expected
    metric-neutral (A/B harness: scripts/learning_proof.py
    --jitter-order; PARITY.md divergence #1, PERF.md)
  * ClipToTensor /255 + ImageNet mean/std normalize (volume_transforms,
    tensor_transforms)
  * eval path: short-side Resize(crop/0.875) + CenterCrop (MSC), exact
    Resize(resize) + CenterCrop (Crop_CJ)

Intentional divergence (documented): the reference swaps PIL
interpolation flags ('bilinear' -> NEAREST, functional.py:58-61) — a bug
we do not reproduce: resizes here are true bilinear.

TPU-first: crops are `scale_and_translate` / `dynamic_slice` (no dynamic
shapes), the whole pipeline fuses into the step's first conv under jit.
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
    """Reference RandomResizedCrop box sampling, branchless: `attempts`
    candidate boxes are drawn; the first valid one is used, falling back
    to a max-area center crop (video_transforms.py:330-372). Box sizes
    are ROUNDED and positions drawn on the INTEGER grid (`randint(0,
    im - crop)` inclusive, video_transforms.py:350-356) — exactly the
    reference's discrete crop distribution, not a continuous relaxation.
    Returns (top, left, crop_h, crop_w) as integer-valued f32 scalars."""
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
    # w = int(round(sqrt(ta * ar))), h = int(round(sqrt(ta / ar)))
    # (video_transforms.py:350-351; jnp.round is round-half-even, the
    # same rule as the reference's python round())
    crop_w = jnp.round(jnp.sqrt(target_area * aspect))
    crop_h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (crop_w <= w) & (crop_h <= h)
    # first valid attempt (argmax of bool picks first True)
    first = jnp.argmax(valid)
    any_valid = jnp.any(valid)

    # fallback: center crop at the max feasible size with a valid ratio
    # (video_transforms.py:359-372)
    in_ratio = w / h
    fb_w = jnp.where(
        in_ratio < ratio[0],
        float(w),
        jnp.where(in_ratio > ratio[1], jnp.round(h * ratio[1]), float(w)),
    )
    fb_h = jnp.where(
        in_ratio < ratio[0],
        jnp.round(w / ratio[0]),
        jnp.where(in_ratio > ratio[1], float(h), float(h)),
    )
    c_w = jnp.where(any_valid, crop_w[first], fb_w)
    c_h = jnp.where(any_valid, crop_h[first], fb_h)

    # integer-grid position: randint(0, im - crop) INCLUSIVE of both ends
    # = floor(u * (im - crop + 1)) for u ~ U[0,1); fallback centers with
    # the reference's floor-division
    u_top = jax.random.uniform(k_top)
    u_left = jax.random.uniform(k_left)
    top = jnp.where(
        any_valid,
        jnp.minimum(jnp.floor(u_top * (h - c_h + 1.0)), h - c_h),
        jnp.floor((h - c_h) / 2.0),
    )
    left = jnp.where(
        any_valid,
        jnp.minimum(jnp.floor(u_left * (w - c_w + 1.0)), w - c_w),
        jnp.floor((w - c_w) / 2.0),
    )
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
    order: str = "canonical",
) -> jnp.ndarray:
    """Clip-consistent color jitter on float RGB in [0,1]
    (video_transforms.py:438-475; factors sampled once per clip).

    order='random' (reference parity): the active ops are
    applied in a uniformly random order per clip (the reference
    random.shuffle's its op list per call, video_transforms.py:462) —
    in-graph as one `lax.switch` per step over the active ops. Under
    vmap the switch evaluates every branch and selects, but XLA fuses
    all branches of a step into a single elementwise kernel, so the
    extra cost is VPU ALU only, not HBM traffic (measured ~neutral,
    PERF.md). order='canonical' applies brightness->contrast->
    saturation->hue in that fixed order (rounds 1-4 behavior; same
    factor streams, so tests can A/B the two orders exactly). Default
    'canonical': an aug-order permutation (expected metric-neutral,
    PARITY.md #1) where 'random' costs ~8% of flagship-step throughput
    (PERF.md)."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    # factors are cast to the clip dtype: jax.random.uniform returns a
    # STRONG f32 scalar, and bf16 * f32 promotes — without the cast the
    # whole jitter chain (incl. both HSV conversions) silently runs at
    # full-res f32, doubling its HBM traffic
    ops = []
    if brightness > 0:
        f_b = jax.random.uniform(
            kb, minval=max(0.0, 1 - brightness), maxval=1 + brightness
        ).astype(clip.dtype)
        ops.append(lambda x: jnp.clip(x * f_b, 0.0, 1.0))
    if contrast > 0:
        f_c = jax.random.uniform(
            kc, minval=max(0.0, 1 - contrast), maxval=1 + contrast
        ).astype(clip.dtype)

        def _contrast(x):
            # PIL Contrast: blend each FRAME with its own mean-luminance
            # gray (torchvision adjust_contrast is per-image; a
            # whole-clip mean would shift every frame of a clip with
            # changing brightness)
            lum = jnp.mean(
                0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2],
                axis=(-2, -1), keepdims=True,
            )[..., None]
            return jnp.clip((x - lum) * f_c + lum, 0.0, 1.0)

        ops.append(_contrast)
    if saturation > 0:
        f_s = jax.random.uniform(
            ks, minval=max(0.0, 1 - saturation), maxval=1 + saturation
        ).astype(clip.dtype)

        def _saturate(x):
            gray = (
                0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
            )[..., None]
            return jnp.clip((x - gray) * f_s + gray, 0.0, 1.0)

        ops.append(_saturate)
    if hue > 0:
        f_h = jax.random.uniform(
            kh, minval=-hue, maxval=hue
        ).astype(clip.dtype)

        def _hue(x):
            hsv = _rgb_to_hsv(x)
            hsv = hsv.at[..., 0].set((hsv[..., 0] + f_h) % 1.0)
            return _hsv_to_rgb(hsv)

        ops.append(_hue)

    if not ops:
        return clip
    if order == "canonical" or len(ops) == 1:
        for op in ops:
            clip = op(clip)
        return clip
    if order != "random":
        raise ValueError(
            f"jitter order must be 'random' or 'canonical', got {order!r}"
        )
    perm = jax.random.permutation(kp, len(ops))
    for step in range(len(ops)):
        clip = jax.lax.switch(perm[step], ops, clip)
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
    jitter_order: str = "canonical",
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
        out = color_jitter_clip(k_jit, out, *color, order=jitter_order)
        return normalize_clip(out)

    return jax.vmap(one)(keys, frames)


def crop_augment_clips_train(
    key: jax.Array,
    frames: jnp.ndarray,
    crop_size: int = 224,
    resize: Tuple[int, int] = (256, 256),
    color: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 0.2),
    flip: bool = True,
    dtype: jnp.dtype = jnp.float32,
    jitter_order: str = "canonical",
) -> jnp.ndarray:
    """Training path of VideoPrep_Crop_CJ (preprocessing.py:83-90,
    selected by `transform: crop+color` at utils/eval_utils.py:79-86 —
    the Kinetics linear-probe recipe): exact aspect-distorting
    Resize(resize) (Resize with a TUPLE resizes to exactly that shape,
    videotransforms/functional.py:38-39) -> integer-grid RandomCrop
    (video_transforms.py:181-226, randint inclusive) -> HFlip ->
    ColorJitter -> normalize, for a uint8 batch (B, T, H, W, C) ->
    normalized float (B, T, S, S, C).

    The resize is one static-shape bilinear for the whole batch; the
    random crop is a `dynamic_slice` per clip (static size, traced
    origin) — no dynamic shapes anywhere."""
    b, t, h, w, c = frames.shape
    rh, rw = resize
    if rh < crop_size or rw < crop_size:
        raise ValueError(
            f"resize {resize} smaller than crop {crop_size} "
            "(reference RandomCrop raises too, video_transforms.py:206-212)"
        )
    resized = jax.image.resize(
        frames.astype(dtype), (b, t, rh, rw, c), method="bilinear"
    )
    keys = jax.random.split(key, b)

    def one(key, clip):
        k_top, k_left, k_flip, k_jit = jax.random.split(key, 4)
        top = jax.random.randint(k_top, (), 0, rh - crop_size + 1)
        left = jax.random.randint(k_left, (), 0, rw - crop_size + 1)
        out = jax.lax.dynamic_slice(
            clip, (0, top, left, 0), (t, crop_size, crop_size, c)
        )
        out = out / 255.0
        if flip:
            do = jax.random.bernoulli(k_flip)
            out = jnp.where(do, out[:, :, ::-1, :], out)
        out = color_jitter_clip(k_jit, out, *color, order=jitter_order)
        return normalize_clip(out)

    return jax.vmap(one)(keys, resized)


def crop_augment_clips_eval(
    frames: jnp.ndarray,
    crop_size: int = 224,
    resize: Tuple[int, int] = (256, 256),
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Eval path of VideoPrep_Crop_CJ (preprocessing.py:91-95): exact
    Resize(resize) + CenterCrop + normalize — aspect-distorting, unlike
    the MSC eval path's short-side resize."""
    b, t, h, w, c = frames.shape
    rh, rw = resize
    out = jax.image.resize(
        frames.astype(dtype), (b, t, rh, rw, c), method="bilinear"
    )
    top = (rh - crop_size) // 2
    left = (rw - crop_size) // 2
    out = out[:, :, top : top + crop_size, left : left + crop_size, :]
    return normalize_clip(out / 255.0)


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
