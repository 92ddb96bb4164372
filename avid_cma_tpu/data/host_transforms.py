"""Host-side (numpy/cv2) clip transforms.

Capability reference: utils/videotransforms/ (video_transforms.py:19-548,
volume_transforms.py:15-66, tensor_transforms.py:13-37). The device path
(ops/video_aug.py) covers the transforms the training recipes actually
use; this module provides the same semantics on the host for CPU-only
runs, data-debugging, and the long tail of classes the reference ships
(gray, ten-crop, temporal jitter/crop).

All transforms take/return uint8 or float numpy clips shaped (T, H, W, C)
and are clip-consistent (one random draw per clip), like the reference.
Known reference bugs NOT reproduced: the swapped PIL interpolation flags
(functional.py:58-61) and SpatialRandomCrop's h/w mixup
(tensor_transforms.py:65).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, clip):
        for t in self.transforms:
            clip = t(clip)
        return clip


def _resize_clip(clip: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.stack(
        [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in clip]
    )


class RandomDrop:
    """Keep `num_frames` random frames, in order
    (video_transforms.py:36-48)."""

    def __init__(self, num_frames: int):
        self.num_frames = num_frames

    def __call__(self, clip):
        t = len(clip)
        assert t >= self.num_frames
        if t == self.num_frames:
            return clip
        idx = sorted(random.sample(range(t), k=self.num_frames))
        return clip[np.asarray(idx)]


class UniformDrop:
    """Uniformly subsample to `num_frames`, or stride by `ss_ratio`
    (video_transforms.py:51-68)."""

    def __init__(self, num_frames: Optional[int] = None,
                 ss_ratio: Optional[float] = None):
        self.num_frames = num_frames
        self.ss_ratio = ss_ratio

    def __call__(self, clip):
        t = len(clip)
        if self.num_frames is not None:
            if t <= self.num_frames:
                return clip
            idx = np.linspace(0, t - 1, self.num_frames, endpoint=True)
            return clip[idx.astype(int)]
        if self.ss_ratio is not None and self.ss_ratio != 1:
            return clip[np.arange(0, t, self.ss_ratio).astype(int)]
        return clip


class RandomResize:
    """Scale by a random factor in `ratio` (video_transforms.py:127-158)."""

    def __init__(self, ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)):
        self.ratio = ratio

    def __call__(self, clip):
        s = random.uniform(self.ratio[0], self.ratio[1])
        t, h, w, c = clip.shape
        return _resize_clip(clip, int(h * s), int(w * s))


class Resize:
    """Short-side (scalar) or exact (tuple) resize
    (video_transforms.py:159-180 semantics)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, clip):
        t, h, w, c = clip.shape
        if isinstance(self.size, (tuple, list)):
            nh, nw = self.size
        else:
            scale = self.size / min(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
        return _resize_clip(clip, nh, nw)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, clip):
        ch, cw = self.size
        t, h, w, c = clip.shape
        top, left = (h - ch) // 2, (w - cw) // 2
        return clip[:, top : top + ch, left : left + cw]


class RandomCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, clip):
        ch, cw = self.size
        t, h, w, c = clip.shape
        top = random.randint(0, h - ch)
        left = random.randint(0, w - cw)
        return clip[:, top : top + ch, left : left + cw]


class RandomResizedCrop:
    """One crop box per clip (video_transforms.py:303-382)."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale, self.ratio = scale, ratio

    def __call__(self, clip):
        t, h, w, c = clip.shape
        area = h * w
        for _ in range(10):
            target = area * random.uniform(*self.scale)
            aspect = np.exp(random.uniform(*np.log(self.ratio)))
            cw = int(round(np.sqrt(target * aspect)))
            ch = int(round(np.sqrt(target / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                top = random.randint(0, h - ch)
                left = random.randint(0, w - cw)
                crop = clip[:, top : top + ch, left : left + cw]
                return _resize_clip(crop, *self.size)
        return CenterCrop(self.size)(Resize(min(self.size))(clip))


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, clip):
        return clip[:, :, ::-1] if random.random() < self.p else clip


class RandomGray:
    """(video_transforms.py:101-126)."""

    def __init__(self, p: float = 0.2):
        self.p = p

    def __call__(self, clip):
        if random.random() >= self.p:
            return clip
        gray = (
            0.299 * clip[..., 0] + 0.587 * clip[..., 1] + 0.114 * clip[..., 2]
        )
        return np.repeat(gray[..., None], 3, axis=-1).astype(clip.dtype)


class ColorJitter:
    """Clip-consistent brightness/contrast/saturation/hue with random op
    order (video_transforms.py:393-475)."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue

    def __call__(self, clip):
        x = clip.astype(np.float32) / 255.0 if clip.dtype == np.uint8 else clip
        ops = []
        if self.b > 0:
            f = random.uniform(max(0, 1 - self.b), 1 + self.b)
            ops.append(lambda im, f=f: np.clip(im * f, 0, 1))
        if self.c > 0:
            f = random.uniform(max(0, 1 - self.c), 1 + self.c)

            def contrast(im, f=f):
                lum = (0.299 * im[..., 0] + 0.587 * im[..., 1]
                       + 0.114 * im[..., 2]).mean()
                return np.clip((im - lum) * f + lum, 0, 1)

            ops.append(contrast)
        if self.s > 0:
            f = random.uniform(max(0, 1 - self.s), 1 + self.s)

            def saturate(im, f=f):
                g = (0.299 * im[..., 0] + 0.587 * im[..., 1]
                     + 0.114 * im[..., 2])[..., None]
                return np.clip((im - g) * f + g, 0, 1)

            ops.append(saturate)
        if self.h > 0:
            f = random.uniform(-self.h, self.h)

            def hue(im, f=f):
                hsv = cv2.cvtColor((im * 255).astype(np.uint8),
                                   cv2.COLOR_RGB2HSV).astype(np.float32)
                hsv[..., 0] = (hsv[..., 0] + f * 180.0) % 180.0
                out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
                return out.astype(np.float32) / 255.0

            ops.append(lambda im: np.stack([hue(fr) for fr in im]))
        random.shuffle(ops)
        for op in ops:
            x = op(x)
        out = x * 255.0 if clip.dtype == np.uint8 else x
        return out.astype(clip.dtype) if clip.dtype == np.uint8 else out


class TenCrop:
    """4 corners + center, plus flips (video_transforms.py:273-300)."""

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, clip):
        ch, cw = self.size
        t, h, w, c = clip.shape
        boxes = [
            (0, 0), (0, w - cw), (h - ch, 0), (h - ch, w - cw),
            ((h - ch) // 2, (w - cw) // 2),
        ]
        crops = [clip[:, tp : tp + ch, lp : lp + cw] for tp, lp in boxes]
        crops += [cr[:, :, ::-1] for cr in crops]
        return np.stack(crops)


class TemporalJitter:
    """Random temporal offset of up to max_shift frames
    (video_transforms.py:479-514 semantics)."""

    def __init__(self, num_frames: int, max_shift: int = 0):
        self.num_frames = num_frames
        self.max_shift = max_shift

    def __call__(self, clip):
        t = clip.shape[0]
        start = random.randint(0, max(0, min(self.max_shift, t - self.num_frames)))
        out = clip[start : start + self.num_frames]
        return pad_missing_frames(out, self.num_frames)


class TemporalCenterCrop:
    """(video_transforms.py:517-548)."""

    def __init__(self, num_frames: int):
        self.num_frames = num_frames

    def __call__(self, clip):
        t = clip.shape[0]
        start = max(0, (t - self.num_frames) // 2)
        return pad_missing_frames(clip[start : start + self.num_frames],
                                  self.num_frames)


class ClipToTensor:
    """uint8 (T,H,W,C) -> float32 /255 (volume_transforms.py:15-66; we
    keep channels-last instead of the reference's (C,T,H,W))."""

    def __call__(self, clip):
        return clip.astype(np.float32) / 255.0


class Normalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, clip):
        return (clip - self.mean) / self.std


def pad_missing_frames(clip: np.ndarray, num_frames: int) -> np.ndarray:
    """Pad-by-looping (reference: preprocessing.py:53-59)."""
    while clip.shape[0] < num_frames:
        clip = np.concatenate(
            [clip, clip[: num_frames - clip.shape[0]]], axis=0
        )
    return clip


def video_prep_msc_cj(
    crop: int = 224,
    color: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 0.2),
    min_area: float = 0.08,
    augment: bool = True,
    num_frames: Optional[int] = None,
):
    """Host-side VideoPrep_MSC_CJ (preprocessing.py:15-60) returning a
    callable clip -> normalized float (T, S, S, C)."""
    if augment:
        ts = [
            RandomResizedCrop(crop, scale=(min_area, 1.0)),
            RandomHorizontalFlip(),
            ColorJitter(*color),
        ]
    else:
        ts = [Resize(int(crop / 0.875)), CenterCrop(crop)]
    ts += [ClipToTensor(), Normalize()]
    pipeline = Compose(ts)

    def fn(clip):
        out = pipeline(clip)
        if num_frames:
            out = pad_missing_frames(out, num_frames)
        return out

    return fn


def video_prep_crop_cj(
    crop: int = 224,
    resize: Tuple[int, int] = (256, 256),
    color: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 0.2),
    augment: bool = True,
    num_frames: Optional[int] = None,
):
    """Host-side VideoPrep_Crop_CJ (preprocessing.py:63-113) returning a
    callable clip -> normalized float (T, S, S, C): exact
    (aspect-distorting) Resize(resize) + RandomCrop train branch,
    Resize + CenterCrop eval branch. Selected by `transform:
    crop+color` (utils/eval_utils.py:79-86, the Kinetics linear
    probe)."""
    if augment:
        ts = [
            Resize(tuple(resize)),
            RandomCrop(crop),
            RandomHorizontalFlip(),
            ColorJitter(*color),
        ]
    else:
        ts = [Resize(tuple(resize)), CenterCrop(crop)]
    ts += [ClipToTensor(), Normalize()]
    pipeline = Compose(ts)

    def fn(clip):
        out = pipeline(clip)
        if num_frames:
            out = pad_missing_frames(out, num_frames)
        return out

    return fn
