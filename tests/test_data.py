"""Data layer: synthetic decode determinism, clip/video dataset modes,
sharded loader semantics, device preprocessing shapes
(reference semantics: datasets/video_db.py, utils/main_utils.py:138-228)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avid_cma_tpu.data import (  # noqa: F401
    DataLoader,
    Kinetics,
    PreprocessConfig,
    ShardedBatchSampler,
    SyntheticBackend,
    UCF,
    VideoDataset,
    preprocess_batch,
)


def small_backend():
    return SyntheticBackend(duration=4.0, video_fps=8.0, height=64, width=80)


def make_ds(**kw):
    be = small_backend()
    fns = [f"v{i}.mp4" for i in range(6)]
    defaults = dict(
        backend=be,
        video_fns=fns,
        video_clip_duration=0.5,
        video_fps=8.0,
        audio_clip_duration=1.0,
        audio_fps=8000,
        return_index=True,
    )
    defaults.update(kw)
    return VideoDataset(**defaults)


def test_synthetic_backend_deterministic():
    be = small_backend()
    f1 = be.load_video("a.mp4", 1.0, 0.5, 8.0)
    f2 = be.load_video("a.mp4", 1.0, 0.5, 8.0)
    f3 = be.load_video("b.mp4", 1.0, 0.5, 8.0)
    np.testing.assert_array_equal(f1, f2)
    assert not np.array_equal(f1, f3)
    assert f1.shape == (4, 64, 80, 3) and f1.dtype == np.uint8
    a = be.load_audio("a.mp4", 0.0, 1.0, 8000)
    assert a.shape == (8000,) and a.dtype == np.float32
    assert np.abs(a).max() <= 1.0


def test_clip_mode_sample():
    ds = make_ds(mode="clip", mode_clips_per_video=3)
    assert len(ds) == 18  # num_samples * clips_per_video (video_db.py:238-242)
    s = ds[7]
    assert s["frames"].shape == (4, 64, 80, 3)
    assert s["audio"].shape == (8000,)
    assert s["index"] == 7 % 6


def test_clip_mode_skips_bad_samples():
    class FlakyBackend(SyntheticBackend):
        def load_video(self, path, *a, **k):
            if "v1" in path:
                raise RuntimeError("corrupt")
            return super().load_video(path, *a, **k)

    be = FlakyBackend(duration=4.0, video_fps=8.0, height=32, width=32)
    ds = make_ds(backend=be)
    s = ds[1]  # index 1 is corrupt -> falls through to index 2
    assert s["index"] == 2


def test_video_mode_dense_chunks():
    ds = make_ds(mode="video", mode_clips_per_video=5)
    assert len(ds) == 6
    s = ds[0]
    # 4s @ 8fps = 32 frames total; chunk = 0.5*8 = 4 frames
    assert s["frames"].shape == (5, 4, 64, 80, 3)
    # audio: 4s @ 8k = 32000; chunk = 1.0*8000
    assert s["audio"].shape == (5, 8000)
    assert s["index"].shape == (5,)
    # chunks uniformly spaced: first starts at 0, last at n-chunk
    full = ds.backend.load_video("v0.mp4", 0.0, 4.0, 8.0)
    np.testing.assert_array_equal(s["frames"][0], full[:4])
    np.testing.assert_array_equal(s["frames"][-1], full[28:32])


def test_sharded_sampler_partitions():
    n = 40
    shards = [
        ShardedBatchSampler(
            n, 4, shuffle=True, drop_last=False, num_shards=4, shard_index=i, seed=1
        )
        for i in range(4)
    ]
    seen = []
    for s in shards:
        for batch in s:
            seen.extend(batch.tolist())
    # without drop_last, the 4 shards exactly cover the dataset
    assert sorted(set(seen)) == list(range(n))
    # with drop_last, ragged tail batches are dropped per shard
    dropping = ShardedBatchSampler(
        n, 4, shuffle=True, drop_last=True, num_shards=4, shard_index=0, seed=1
    )
    assert len(dropping) == 10 // 4


def test_sampler_epoch_reshuffles():
    s = ShardedBatchSampler(32, 8, shuffle=True, seed=0)
    e0 = np.concatenate(list(s))
    s.set_epoch(1)
    e1 = np.concatenate(list(s))
    assert not np.array_equal(e0, e1)
    assert sorted(e0) == sorted(e1)


def test_loader_yields_ordered_batches():
    ds = make_ds(mode="clip")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=3)
    batches = list(dl)
    assert len(batches) == 3
    for b in batches:
        assert b["frames"].shape == (2, 4, 64, 80, 3)
        assert b["audio"].shape == (2, 8000)
    idx = np.concatenate([b["index"] for b in batches])
    np.testing.assert_array_equal(idx, np.arange(6))


def test_loader_propagates_errors():
    class BadDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("boom")

    dl = DataLoader(BadDS(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(dl)


def test_dataset_registry_synthetic():
    ds = Kinetics(
        subset="train", backend="synthetic", synthetic_size=8,
        mode="clip", video_clip_duration=0.5, video_fps=16.0,
        audio_clip_duration=2.0, audio_fps=24000,
        return_labels=True, return_index=True,
    )
    s = ds[0]
    assert "label" in s and 0 <= s["label"] < 400
    ucf = UCF(
        subset="trainlist01", backend="synthetic", synthetic_size=8,
        mode="clip", return_audio=False, return_labels=True,
    )
    s = ucf[0]
    assert "audio" not in s and "label" in s


def test_preprocess_batch_shapes():
    cfg = PreprocessConfig(
        crop_size=32, audio_fps=8000, n_fft=128,
        spectrogram_fps=100.0, audio_clip_duration=1.0,
        normalize_spectrogram=False,
    )
    batch = {
        "frames": np.random.default_rng(0).integers(0, 255, (2, 4, 64, 80, 3), dtype=np.uint8),
        "audio": np.random.default_rng(1).normal(size=(2, 8000)).astype(np.float32),
        "index": np.arange(2, dtype=np.int32),
    }
    out = preprocess_batch(jax.random.key(0), batch, cfg, train=True)
    assert out["frames"].shape == (2, 4, 32, 32, 3)
    assert out["audio"].shape == (2, 100, 65, 1)
    assert np.all(np.isfinite(np.asarray(out["frames"])))
    assert np.all(np.isfinite(np.asarray(out["audio"])))
    out_eval = preprocess_batch(jax.random.key(0), batch, cfg, train=False)
    assert out_eval["frames"].shape == (2, 4, 32, 32, 3)


def test_audioset_constructs_from_shipped_cache_list():
    """The packaged AudioSet cache lists (assets/cache/audioset, provenance
    in assets/README.md) must reproduce the reference's instance indexing
    (reference: datasets/audioset.py:55-57) without any media present."""
    from avid_cma_tpu.data.datasets import AUDIOSET_CACHE, AudioSet, AudioSetClasses

    ds = AudioSet(
        subset="unbalanced_train-100k", cache_path=AUDIOSET_CACHE,
        backend="synthetic", mode="clip",
        video_clip_duration=0.25, video_fps=8.0,
        audio_clip_duration=0.5, audio_fps=24000,
        return_labels=False, return_index=True,
    )
    assert len(ds) == 100_000
    eval_ds = AudioSet(
        subset="eval", cache_path=AUDIOSET_CACHE, backend="synthetic",
        mode="clip", video_clip_duration=0.25, video_fps=8.0,
        audio_clip_duration=0.5, audio_fps=24000,
        return_labels=False, return_index=True,
    )
    assert len(eval_ds) > 10_000

    classes = AudioSetClasses()
    assert len(classes) == 527
    assert classes.class_name(0) == "Speech"
    assert classes.class_label("/m/09x0r") == 0


def test_audioset_availability_filter(tmp_path):
    """Only clips present under `root` survive the availability filter
    (reference: datasets/audioset.py:55-57)."""
    from avid_cma_tpu.data.datasets import AudioSet

    cache = tmp_path / "cache"
    cache.mkdir()
    names = [f"vid_{i:03d}.mp4" for i in range(10)]
    (cache / "mini.txt").write_text("\n".join(names))
    root = tmp_path / "media"
    root.mkdir()
    for n in names[:4]:
        (root / n).touch()

    ds = AudioSet(
        subset="mini", cache_path=str(cache), root=str(root),
        backend="synthetic", mode="clip",
        video_clip_duration=0.25, video_fps=8.0,
        audio_clip_duration=0.5, audio_fps=24000,
        return_labels=False, return_index=True,
    )
    assert len(ds) == 4


def test_real_listing_refuses_implicit_synthetic(tmp_path):
    """A real Kinetics root with backend='auto' on a codec-less host must
    raise instead of silently decoding real files synthetically; explicit
    backend='synthetic' stays allowed, and stray non-directory entries
    don't shift label indices."""
    import pytest as _pytest

    from avid_cma_tpu.data.datasets import Kinetics

    base = tmp_path / "train"
    for cls in ("applauding", "zumba"):
        (base / cls).mkdir(parents=True)
        (base / cls / "v_000.mp4").touch()
    (base / "README.txt").write_text("stray file")  # must not become a class

    kw = dict(subset="train", root=str(tmp_path), mode="clip",
              video_clip_duration=0.25, video_fps=8.0,
              audio_clip_duration=0.5, audio_fps=24000,
              return_labels=True, return_index=True)
    with _pytest.raises(RuntimeError, match="synthetic"):
        Kinetics(backend="auto", **kw)

    ds = Kinetics(backend="synthetic", **kw)
    assert ds.classes == ["applauding", "zumba"]
    assert sorted(set(np.asarray(ds.labels))) == [0, 1]


def test_dense_mode_survives_decode_failure():
    """A corrupt video in dense eval scores as zeros with the right label
    instead of killing the run (deliberate divergence: the reference
    crashes, datasets/video_db.py:109-151)."""
    import warnings

    from avid_cma_tpu.data.decode import SyntheticBackend
    from avid_cma_tpu.data.video_db import VideoDataset

    class FlakyBackend(SyntheticBackend):
        def get_meta(self, path):
            if b"bad" in path if isinstance(path, bytes) else "bad" in path:
                raise RuntimeError("corrupt container")
            return super().get_meta(path)

    ds = VideoDataset(
        backend=FlakyBackend(duration=4.0, video_fps=8.0, height=32, width=40),
        video_fns=["ok_0.mp4", "bad_1.mp4"], labels=[3, 7], mode="video",
        video_clip_duration=0.5, video_fps=8.0, return_audio=False,
        audio_clip_duration=0.5, audio_fps=24000,
        return_labels=True, return_index=True, mode_clips_per_video=4,
    )
    good = ds[0]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bad = ds[1]
    assert ds.decode_failures == 1
    assert bad["frames"].shape[0] == 4 and bad["label"] == 7
    assert np.all(bad["frames"] == 0)
    # FULL shape equality, H/W included: dense eval batches rows from
    # failed and healthy videos together (np.stack), so a fallback at the
    # wrong resolution would crash the eval this fallback exists to save
    assert good["frames"].shape == bad["frames"].shape


def test_sampler_pad_exceeding_dataset_len():
    """num_shards > dataset_len: every shard must still see the same
    index count (a short pad would desynchronize multihost step counts)."""
    from avid_cma_tpu.data.loader import ShardedBatchSampler

    counts = []
    for shard in range(8):
        s = ShardedBatchSampler(
            dataset_len=2, batch_size=1, shuffle=False, drop_last=False,
            num_shards=8, shard_index=shard,
        )
        batches = list(s)
        assert len(batches) == len(s)
        counts.append(sum(len(b) for b in batches))
    assert counts == [1] * 8


def test_sampler_rejects_zero_batch():
    from avid_cma_tpu.data.loader import ShardedBatchSampler

    with pytest.raises(ValueError, match="batch_size"):
        ShardedBatchSampler(dataset_len=10, batch_size=0)


def test_non_ascii_filenames():
    from avid_cma_tpu.data.decode import SyntheticBackend
    from avid_cma_tpu.data.video_db import VideoDataset

    ds = VideoDataset(
        backend=SyntheticBackend(duration=2.0, height=16, width=16),
        video_fns=["café_0.mp4", "日本語_1.mp4"], mode="clip",
        video_clip_duration=0.25, video_fps=8.0, return_audio=False,
    )
    out = ds[1]
    assert out["frames"].shape == (2, 16, 16, 3)


def test_dense_chunk_pads_short_videos():
    """Videos shorter than one clip are padded by looping to the fixed
    chunk length — constant shapes, no per-video jit recompiles."""
    from avid_cma_tpu.data.decode import SyntheticBackend
    from avid_cma_tpu.data.video_db import VideoDataset

    ds = VideoDataset(
        backend=SyntheticBackend(duration=0.25, video_fps=8.0,
                                 height=32, width=40),
        video_fns=["short.mp4"], labels=[1], mode="video",
        video_clip_duration=1.0, video_fps=8.0, return_audio=False,
        audio_clip_duration=0.5, audio_fps=24000,
        return_labels=True, return_index=True, mode_clips_per_video=3,
    )
    out = ds[0]
    assert out["frames"].shape == (3, 8, 32, 40, 3)  # full clip length


def test_loader_set_start_batch_skips_decodes():
    """Mid-epoch resume skips batches at the INDEX level: skipped batches
    must never hit the dataset (no decode paid), and the skip is one-shot."""
    from avid_cma_tpu.data.loader import DataLoader

    class CountingDS:
        def __init__(self, n):
            self.n = n
            self.calls = []

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.calls.append(i)
            return {"x": np.full((2,), i, np.int32)}

    ds = CountingDS(12)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=1)
    loader.set_start_batch(4)
    batches = list(loader)
    assert len(batches) == 2  # 6 total - 4 skipped
    assert sorted(ds.calls) == [8, 9, 10, 11]  # first 4 batches never decoded
    # one-shot: the next epoch iterates fully
    ds.calls.clear()
    assert len(list(loader)) == 6 and len(ds.calls) == 12


def test_scale_crop_frames_cover_semantics():
    from avid_cma_tpu.data.decode import scale_crop_frames

    # channel 0 = horizontal coordinate ramp (x: 0..159): geometry probe
    xx = np.broadcast_to(np.arange(160, dtype=np.uint8), (90, 160))
    frames = np.stack([np.stack([xx, xx, xx], axis=-1)] * 3)
    out = scale_crop_frames(frames, (64, 64))
    assert out.shape == (3, 64, 64, 3) and out.dtype == np.uint8
    # cover scale + CENTER crop: scale=max(64/90,64/160)=64/90, so the
    # visible horizontal field is the central 90 of 160 source columns
    # (x in [35, 125]). A squash resize would span 0..159; a top-left
    # crop would span 0..90.
    ramp = out[0, 32, :, 0].astype(np.int32)
    assert 30 <= ramp.min() <= 40, ramp.min()
    assert 120 <= ramp.max() <= 130, ramp.max()
    assert (np.diff(ramp) >= 0).all()  # still a monotone ramp
    up = scale_crop_frames(frames, (128, 200))  # upscale path
    assert up.shape == (3, 128, 200, 3)
    # no-op when already at size
    same = scale_crop_frames(frames, (90, 160))
    assert same is frames


def test_decode_size_reaches_backend_from_config():
    """dataset.decode_size must fix the decoded frame size (static shapes
    for collate + jit across heterogeneous real media) and expose it as
    backend.frame_hw for the dense-eval failure fallback."""
    from avid_cma_tpu.config import from_dict
    from avid_cma_tpu.train import builders

    db = from_dict({
        "name": "ucf101", "backend": "synthetic", "synthetic_size": 4,
        "fold": 1, "batch_size": 2, "clip_duration": 0.25,
        "video_fps": 8.0, "decode_size": [48, 64],
        "train": {"split": "trainlist{fold:02d}", "mode": "clip",
                  "clips_per_video": 1, "use_augmentation": True},
    })
    ds = builders.build_dataset(db, db.train, return_audio=False,
                                return_labels=True, fold=1)
    assert ds.backend.frame_hw == (48, 64)
    assert ds[0]["frames"].shape[1:] == (48, 64, 3)


def test_build_preprocess_config_transform_dispatch():
    """The `transform:`/`transforms:` config key must be HONORED (it was
    silently dropped for four rounds) and unknown values must fail fast
    (reference raises too, utils/eval_utils.py:86-87)."""
    import pytest

    from avid_cma_tpu.config import from_dict, load
    from avid_cma_tpu.train.builders import build_preprocess_config

    # pretrain configs carry `transforms:` (utils/main_utils.py)
    pp = build_preprocess_config(from_dict(
        {"transforms": "msc+color", "crop_size": 112,
         "color": [0.4, 0.4, 0.4, 0.2], "min_area": 0.08}
    ))
    assert pp.transform == "msc+color" and pp.crop_size == 112

    # the shipped Kinetics linear-probe recipe selects crop+color; the
    # reference dispatch runs VideoPrep_Crop_CJ's DEFAULT color
    # (0.4,0.4,0.4,0.2) — the config's color: [0,0,0,0] is NOT passed
    # (utils/eval_utils.py:80-85)
    cfg = load("configs/benchmark/kinetics/8x224x224-linear.yaml")
    pp = build_preprocess_config(cfg.dataset)
    assert pp.transform == "crop+color"
    assert pp.resize == (256, 256)
    assert pp.color == (0.4, 0.4, 0.4, 0.2)

    with pytest.raises(ValueError, match="transform"):
        build_preprocess_config(from_dict({"transform": "bogus+color"}))


def test_preprocess_batch_crop_color_routing():
    """preprocess_batch routes crop+color to the Crop_CJ branches (exact
    resize + random/center crop) for train and eval."""
    import jax

    from avid_cma_tpu.data.pipelines import PreprocessConfig, preprocess_batch

    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.integers(
            0, 255, (2, 3, 80, 100, 3), dtype=np.uint8
        )),
        "index": jnp.arange(2, dtype=jnp.int32),
    }
    cfg = PreprocessConfig(transform="crop+color", crop_size=48,
                           resize=(64, 64), video_dtype="float32")
    out_tr = preprocess_batch(jax.random.key(0), batch, cfg, train=True)
    out_ev = preprocess_batch(jax.random.key(0), batch, cfg, train=False)
    assert out_tr["frames"].shape == (2, 3, 48, 48, 3)
    assert out_ev["frames"].shape == (2, 3, 48, 48, 3)

    bad = PreprocessConfig(transform="nope", crop_size=48)
    try:
        preprocess_batch(jax.random.key(0), batch, bad, train=True)
    except ValueError as e:
        assert "transform" in str(e)
    else:
        raise AssertionError("unknown transform must raise")


def test_cached_loader_replays_first_epoch():
    """kind='cached' decodes once and replays: epoch 0's batches are
    stored and every later epoch yields the identical raw batches with
    zero dataset decodes; set_start_batch skips on replay (mid-epoch
    resume)."""
    from avid_cma_tpu.data.loader import CachedDataLoader, DataLoader

    ds = make_ds(mode="clip")
    calls = {"n": 0}
    orig = ds.__getitem__

    class Counting:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            calls["n"] += 1
            return orig(i)

    dl = CachedDataLoader(
        DataLoader(Counting(), batch_size=2, shuffle=True, num_workers=2)
    )
    dl.set_epoch(0)
    first = [b["index"].copy() for b in dl]
    decodes_after_fill = calls["n"]
    assert decodes_after_fill == 6
    dl.set_epoch(1)  # replay ignores reshuffle by design
    second = [b["index"].copy() for b in dl]
    assert calls["n"] == decodes_after_fill  # no new decodes
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    dl.set_start_batch(2)
    rest = list(dl)
    assert len(rest) == len(first) - 2
    np.testing.assert_array_equal(rest[0]["index"], first[2])


def test_cached_loader_via_builder():
    from avid_cma_tpu.config import from_dict
    from avid_cma_tpu.data.loader import CachedDataLoader
    from avid_cma_tpu.train import builders

    db = from_dict({
        "name": "kinetics", "backend": "synthetic", "synthetic_size": 8,
        "batch_size": 4, "video_clip_duration": 0.25, "video_fps": 8.0,
        "crop_size": 32, "audio_clip_duration": 0.5, "audio_fps": 24000,
        "spectrogram_fps": 100.0, "n_fft": 512,
        "train": {"split": "train", "use_augmentation": True,
                  "drop_last": True, "clips_per_video": 1},
    })
    ds = builders.build_dataset(db, db.train, mode="clip")
    dl = builders.build_dataloader(ds, db, db.train, kind="cached")
    assert isinstance(dl, CachedDataLoader)
    assert len(list(dl)) == 2


def test_resolve_compute_dtype():
    """model.dtype resolution: 'auto' = bf16 on accelerators / f32 on
    CPU (this test runs under the CPU pin), explicit values override,
    unknown values raise (the round-5 f32-production-loop bug was a
    silent dtype=None default — see PERF.md)."""
    from avid_cma_tpu.train.builders import resolve_compute_dtype

    assert resolve_compute_dtype("auto") is None  # CPU here
    assert resolve_compute_dtype(None) is None
    assert resolve_compute_dtype("float32") is None
    assert resolve_compute_dtype("bfloat16") == jnp.bfloat16
    with pytest.raises(ValueError, match="dtype"):
        resolve_compute_dtype("fp8")
