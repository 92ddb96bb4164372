"""Device-side augmentation invariants (ops/video_aug.py).

The end-to-end path is exercised by test_data.py::test_preprocess_batch_shapes
and the loop tests; these pin the jitter math properties that full-pipeline
shape tests can't see.
"""

import jax
import jax.numpy as jnp
import numpy as np

from avid_cma_tpu.ops.video_aug import color_jitter_clip


def test_contrast_blend_is_per_frame():
    """torchvision adjust_contrast blends each frame toward its OWN gray
    mean — uniform frames are fixed points. A whole-clip mean would shift
    both frames of a bright/dark pair toward each other."""
    clip = jnp.stack([
        jnp.full((8, 8, 3), 0.2, jnp.float32),
        jnp.full((8, 8, 3), 0.8, jnp.float32),
    ])
    out = color_jitter_clip(
        jax.random.key(0), clip, brightness=0.0, contrast=0.4,
        saturation=0.0, hue=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip), atol=1e-5)


def test_jitter_preserves_dtype():
    """bf16 clips must stay bf16 through the jitter chain (jax.random
    factors are strong f32; unchecked promotion doubles HBM traffic)."""
    clip = jnp.ones((4, 8, 8, 3), jnp.bfloat16) * 0.5
    out = color_jitter_clip(
        jax.random.key(1), clip, brightness=0.4, contrast=0.4,
        saturation=0.4, hue=0.2,
    )
    assert out.dtype == jnp.bfloat16


def _mirror_jitter_ops(key, color, dtype=jnp.float32):
    """Mirror of color_jitter_clip's factor sampling + op math (same key
    splits, same formulas) so tests can reconstruct the exact op list and
    the permutation the device drew."""
    from avid_cma_tpu.ops import video_aug as va

    b, c, s, h = color
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    ops = []
    if b > 0:
        fb = jax.random.uniform(
            kb, minval=max(0.0, 1 - b), maxval=1 + b
        ).astype(dtype)
        ops.append(lambda x: jnp.clip(x * fb, 0.0, 1.0))
    if c > 0:
        fc = jax.random.uniform(
            kc, minval=max(0.0, 1 - c), maxval=1 + c
        ).astype(dtype)

        def _contrast(x):
            lum = jnp.mean(
                0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2],
                axis=(-2, -1), keepdims=True,
            )[..., None]
            return jnp.clip((x - lum) * fc + lum, 0.0, 1.0)

        ops.append(_contrast)
    if s > 0:
        fs = jax.random.uniform(
            ks, minval=max(0.0, 1 - s), maxval=1 + s
        ).astype(dtype)

        def _saturate(x):
            gray = (
                0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
            )[..., None]
            return jnp.clip((x - gray) * fs + gray, 0.0, 1.0)

        ops.append(_saturate)
    if h > 0:
        fh = jax.random.uniform(kh, minval=-h, maxval=h).astype(dtype)

        def _hue(x):
            hsv = va._rgb_to_hsv(x)
            hsv = hsv.at[..., 0].set((hsv[..., 0] + fh) % 1.0)
            return va._hsv_to_rgb(hsv)

        ops.append(_hue)
    return ops, kp


def test_jitter_random_order_matches_shuffled_reference():
    """order='random' must apply the active ops in exactly the per-clip
    permutation drawn from the key — the in-graph equivalent of the
    reference's random.shuffle of its op list (video_transforms.py:462)
    — and the permutation marginal must cover the space (hue lands at
    every slot)."""
    rng = np.random.default_rng(7)
    clip = jnp.asarray(rng.uniform(0.1, 0.9, (2, 5, 5, 3)), jnp.float32)
    color = (0.4, 0.4, 0.4, 0.2)
    seen_perms = set()
    hue_pos_counts = np.zeros(4, np.int64)
    for i in range(60):
        key = jax.random.key(1000 + i)
        out = color_jitter_clip(key, clip, *color, order="random")
        ops, kp = _mirror_jitter_ops(key, color)
        perm = tuple(int(p) for p in np.asarray(jax.random.permutation(kp, 4)))
        x = clip
        for p in perm:
            x = ops[p](x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x), atol=2e-6
        )
        seen_perms.add(perm)
        hue_pos_counts[perm.index(3)] += 1
    assert len(seen_perms) >= 12  # 60 draws over 24 perms
    assert (hue_pos_counts > 0).all()


def test_jitter_canonical_order_is_fixed():
    """order='canonical' applies b->c->s->h with the SAME factor streams
    as 'random' (only the order differs)."""
    rng = np.random.default_rng(8)
    clip = jnp.asarray(rng.uniform(0.1, 0.9, (2, 5, 5, 3)), jnp.float32)
    color = (0.4, 0.4, 0.4, 0.2)
    key = jax.random.key(42)
    out = color_jitter_clip(key, clip, *color, order="canonical")
    ops, _ = _mirror_jitter_ops(key, color)
    x = clip
    for op in ops:
        x = op(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-6)


def test_jitter_rejects_unknown_order():
    clip = jnp.ones((1, 4, 4, 3), jnp.float32) * 0.5
    try:
        color_jitter_clip(jax.random.key(0), clip, 0.4, 0.4, 0.4, 0.2,
                          order="bogus")
    except ValueError as e:
        assert "order" in str(e)
    else:
        raise AssertionError("unknown jitter order must raise")


def test_msc_crop_box_integer_grid():
    """Reference RandomResizedCrop draws ROUNDED box sizes and INTEGER
    positions (randint inclusive, video_transforms.py:350-356): every
    sampled (top, left, h, w) must be integral, in-bounds, and the
    position endpoints attainable."""
    from avid_cma_tpu.ops.video_aug import _sample_crop_box

    h, w = 128, 171
    tops, lefts, chs, cws = [], [], [], []
    sample = jax.jit(lambda k: _sample_crop_box(k, h, w, (0.08, 1.0)))
    for i in range(300):
        t, l, ch, cw = sample(jax.random.key(i))
        tops.append(float(t)); lefts.append(float(l))
        chs.append(float(ch)); cws.append(float(cw))
    tops, lefts = np.array(tops), np.array(lefts)
    chs, cws = np.array(chs), np.array(cws)
    for arr in (tops, lefts, chs, cws):
        np.testing.assert_array_equal(arr, np.round(arr))
    assert (chs >= 1).all() and (chs <= h).all()
    assert (cws >= 1).all() and (cws <= w).all()
    assert (tops >= 0).all() and (tops <= h - chs).all()
    assert (lefts >= 0).all() and (lefts <= w - cws).all()
    # inclusive endpoints are reachable (top == h - ch happens)
    assert (tops == h - chs).any() or (tops == 0).any()


def test_crop_cj_train_integer_grid_and_shape():
    """crop+color train branch: exact Resize + integer-grid RandomCrop.
    With a 256x256 column-index ramp input the resize is identity, so the
    first output column reveals the crop origin — it must be an integer
    in [0, 256-224] with both endpoints attainable."""
    from avid_cma_tpu.ops.video_aug import crop_augment_clips_train

    ramp = np.broadcast_to(
        np.arange(256, dtype=np.uint8)[None, None, None, :, None],
        (8, 2, 256, 256, 3),
    )
    out = crop_augment_clips_train(
        jax.random.key(3), jnp.asarray(ramp), crop_size=224,
        resize=(256, 256), color=(0.0, 0.0, 0.0, 0.0), flip=False,
    )
    assert out.shape == (8, 2, 224, 224, 3)
    # invert /255 + ImageNet normalize on channel 0
    first_col = np.asarray(out[:, 0, 0, 0, 0]) * 0.229 + 0.485
    lefts = first_col * 255.0
    np.testing.assert_allclose(lefts, np.round(lefts), atol=1e-3)
    assert (lefts >= -0.01).all() and (lefts <= 32.01).all()
    more = []
    for i in range(60):
        o = crop_augment_clips_train(
            jax.random.key(50 + i), jnp.asarray(ramp[:1]), crop_size=224,
            resize=(256, 256), color=(0.0, 0.0, 0.0, 0.0), flip=False,
        )
        more.append(float(np.asarray(o[0, 0, 0, 0, 0])) * 0.229 * 255.0
                    + 0.485 * 255.0)
    more = np.round(np.array(more)).astype(int)
    assert more.min() <= 2 and more.max() >= 30  # endpoints ~attainable


def test_crop_cj_eval_matches_host():
    """crop+color eval branch (exact Resize + CenterCrop) agrees with
    the host VideoPrep_Crop_CJ equivalent (both bilinear)."""
    from avid_cma_tpu.data import host_transforms as ht
    from avid_cma_tpu.ops.video_aug import crop_augment_clips_eval

    # smooth (band-limited) input: the host mirror downsamples with cv2
    # INTER_LINEAR (no antialias, the reference's numpy branch) while the
    # device resize antialiases (like the reference's PIL branch, the one
    # real decode output takes) — on smooth content both agree
    y = np.linspace(0, 200, 120, dtype=np.float32)[:, None]
    x = np.linspace(0, 55, 160, dtype=np.float32)[None, :]
    img = (y + x).astype(np.uint8)
    frames = np.broadcast_to(
        img[None, None, :, :, None], (2, 3, 120, 160, 3)
    ).copy()
    dev = np.asarray(crop_augment_clips_eval(
        jnp.asarray(frames), crop_size=64, resize=(96, 96)
    ))
    fn = ht.video_prep_crop_cj(crop=64, resize=(96, 96), augment=False)
    host = np.stack([fn(f) for f in frames])
    # units are ImageNet-normalized (std ~0.23): 0.05 ~ 1.2% of [0,1]
    assert np.abs(dev - host).mean() < 0.02
    assert np.abs(dev - host).max() < 0.08


def test_crop_cj_rejects_resize_smaller_than_crop():
    from avid_cma_tpu.ops.video_aug import crop_augment_clips_train

    frames = jnp.zeros((1, 2, 64, 64, 3), jnp.uint8)
    try:
        crop_augment_clips_train(jax.random.key(0), frames, crop_size=224,
                                 resize=(128, 128))
    except ValueError as e:
        assert "resize" in str(e)
    else:
        raise AssertionError("resize < crop must raise")
