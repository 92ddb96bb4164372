"""Host transform library invariants (reference: utils/videotransforms/)."""

import numpy as np

from avid_cma_tpu.data import host_transforms as ht


def _clip(t=4, h=48, w=64):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (t, h, w, 3), dtype=np.uint8)


def test_resize_short_side():
    out = ht.Resize(32)(_clip())
    assert out.shape == (4, 32, 43, 3)  # short side 48 -> 32, round(64*32/48)=43
    out = ht.Resize((20, 30))(_clip())
    assert out.shape == (4, 20, 30, 3)


def test_center_and_random_crop():
    assert ht.CenterCrop(32)(_clip()).shape == (4, 32, 32, 3)
    assert ht.RandomCrop((16, 24))(_clip()).shape == (4, 16, 24, 3)


def test_random_resized_crop_clip_consistent():
    """ONE crop window per clip (reference: RandomResizedCrop samples its
    box once, video_transforms.py:373-382) — per-frame windows are the
    classic video-aug bug. Channel 0 carries an injective coordinate
    ramp: identical post-crop ramps across frames iff every frame used
    the same window. Channel 1 tags the frame index to catch frame
    mixing."""
    yy, xx = np.mgrid[0:48, 0:64]
    ramp = (4 * yy + xx).astype(np.uint8)  # max 251, no wraparound
    clip = np.stack([
        np.stack([ramp, np.full_like(ramp, 30 * i), ramp], axis=-1)
        for i in range(4)
    ])
    out = ht.RandomResizedCrop(24)(clip)
    assert out.shape == (4, 24, 24, 3)
    for i in range(1, 4):
        np.testing.assert_array_equal(out[i, ..., 0], out[0, ..., 0])
        assert (out[i, ..., 1] == 30 * i).all()


def test_flip_and_gray():
    clip = _clip()
    flipped = ht.RandomHorizontalFlip(p=1.0)(clip)
    np.testing.assert_array_equal(flipped, clip[:, :, ::-1])
    gray = ht.RandomGray(p=1.0)(clip)
    assert np.allclose(gray[..., 0], gray[..., 1])


def test_color_jitter_ranges():
    out = ht.ColorJitter(0.4, 0.4, 0.4, 0.2)(_clip())
    assert out.dtype == np.uint8 and out.min() >= 0 and out.max() <= 255


def test_ten_crop():
    out = ht.TenCrop(16)(_clip())
    assert out.shape == (10, 4, 16, 16, 3)


def test_temporal_crops_and_padding():
    clip = _clip(t=10)
    assert ht.TemporalCenterCrop(4)(clip).shape[0] == 4
    assert ht.TemporalJitter(4, max_shift=3)(clip).shape[0] == 4
    # pad-by-looping when the clip is short (preprocessing.py:53-59)
    padded = ht.pad_missing_frames(clip[:3], 8)
    assert padded.shape[0] == 8
    np.testing.assert_array_equal(padded[3], clip[0])


def test_full_msc_cj_pipeline():
    fn = ht.video_prep_msc_cj(crop=32, augment=True, num_frames=6)
    out = fn(_clip())
    assert out.shape == (6, 32, 32, 3) and out.dtype == np.float32
    fn_eval = ht.video_prep_msc_cj(crop=32, augment=False)
    out = fn_eval(_clip())
    assert out.shape == (4, 32, 32, 3)


def test_random_drop_keeps_order():
    from avid_cma_tpu.data.host_transforms import RandomDrop

    clip = np.arange(10)[:, None, None, None] * np.ones((1, 4, 4, 3), np.uint8)
    out = RandomDrop(6)(clip)
    assert out.shape == (6, 4, 4, 3)
    vals = out[:, 0, 0, 0].astype(int)
    assert list(vals) == sorted(vals)  # temporal order preserved
    assert len(set(vals.tolist())) == 6


def test_uniform_drop_modes():
    from avid_cma_tpu.data.host_transforms import UniformDrop

    clip = np.arange(10)[:, None, None, None] * np.ones((1, 4, 4, 3), np.uint8)
    out = UniformDrop(num_frames=5)(clip)
    assert list(out[:, 0, 0, 0]) == [0, 2, 4, 6, 9]  # np.linspace endpoints
    out2 = UniformDrop(ss_ratio=2)(clip)
    assert list(out2[:, 0, 0, 0]) == [0, 2, 4, 6, 8]
    assert UniformDrop(ss_ratio=1)(clip).shape == clip.shape


def test_random_resize_scales_within_ratio():
    from avid_cma_tpu.data.host_transforms import RandomResize

    clip = np.zeros((2, 40, 60, 3), np.uint8)
    out = RandomResize(ratio=(0.5, 0.5))(clip)
    assert out.shape == (2, 20, 30, 3)
