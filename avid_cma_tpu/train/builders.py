"""Config-driven builders: the DI container wiring YAML to components.

Capability reference: utils/main_utils.py:74-262 (build_model /
build_dataloaders / build_criterion / build_optimizer) — registry
lookups parameterized by the reference YAML schema, preserved verbatim
so the reference configs run unchanged.
"""

from __future__ import annotations

from typing import Optional


from avid_cma_tpu.config import Config
import avid_cma_tpu.criterions  # noqa: F401  (populates CRITERIONS)
from avid_cma_tpu.data import DataLoader, PreprocessConfig
from avid_cma_tpu.registry import CRITERIONS, DATASETS, MODELS


def resolve_compute_dtype(spec=None):
    """Model COMPUTATION dtype (params stay f32 — flax keeps
    param_dtype separate, so checkpoints are unchanged): 'auto' (the
    default) = bfloat16 on accelerators, float32 on CPU (where the
    golden/parity tests run); 'float32'/'bfloat16' explicit.

    Round-5 measurement note: before this resolution existed, bench.py
    passed bfloat16 explicitly while the PRODUCTION loops built models
    with dtype=None (float32) — the deployed pretrain step silently ran
    1.7x slower than the benchmarked one (63 -> 106 ms/step at the
    flagship shape; caught by scripts/prod_loop_timing.py)."""
    import jax
    import jax.numpy as jnp

    if spec in (None, "auto"):
        return None if jax.default_backend() == "cpu" else jnp.bfloat16
    if spec in ("float32", "f32"):
        return None  # flax modules default to f32 computation
    if spec in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(
        f"unknown model dtype {spec!r}: expected auto|float32|bfloat16"
    )


def build_model(model_cfg: Config, dtype="config"):
    """reference: utils/main_utils.py:74-93 (arch registry lookup).
    The model `checkpoint` arg (backbone warm-start) is resolved by the
    caller via train.checkpoint.import_model_pth_tar. dtype='config'
    resolves the computation dtype from `model.dtype` (default 'auto' —
    bf16 on TPU); pass an explicit jnp dtype or None (f32) to
    override."""
    args = dict(model_cfg.get("args", {}))
    args.pop("checkpoint", None)
    if dtype == "config":
        dtype = resolve_compute_dtype(model_cfg.get("dtype", "auto"))
    return MODELS.get(model_cfg["arch"])(**args, dtype=dtype)


def model_out_dim(model_cfg: Config) -> int:
    """Embedding dim implied by the model config (reference injects
    model.module.out_dim into the loss args, main-avid.py:100)."""
    proj = model_cfg.get("args", {}).get("proj_dim", 128)
    if proj is None:
        return 512  # backbone out_dim without projection heads
    if isinstance(proj, (list, tuple)):
        return int(proj[-1])
    return int(proj)


def build_criterion_config(loss_cfg: Config, embedding_dim: int = 128):
    """reference: utils/main_utils.py:231-237 + main-avid.py:100-101
    (embedding_dim injected from model.out_dim). Resolves the criterion
    class through the CRITERIONS registry (the same extension surface the
    reference's `criterions.__dict__[name]` lookup provides) and builds
    it via its `from_config` classmethod; the `checkpoint` arg (bank
    restore) is handled by the caller."""
    name = loss_cfg["name"]
    args = dict(loss_cfg.get("args", {}))
    args.pop("checkpoint", None)
    args.pop("device", None)
    return CRITERIONS.get(name).from_config(args, embedding_dim=embedding_dim)


def build_preprocess_config(db_cfg: Config) -> PreprocessConfig:
    """Dispatch on the dataset's `transform:`/`transforms:` key
    (reference: utils/eval_utils.py:70-87, utils/main_utils.py:151-165;
    unknown values raise there and here).

    Reference quirk mirrored deliberately: for 'crop+color' the
    reference dispatch passes ONLY crop/num_frames/pad_missing/augment
    (utils/eval_utils.py:80-85), so VideoPrep_Crop_CJ runs its DEFAULTS
    — resize=(256,256) and color=(0.4,0.4,0.4,0.2) — and the config's
    `resize:`/`color:` keys are ignored (the Kinetics linear probe's
    `color: [0,0,0,0]` notwithstanding, its training frames ARE
    color-jittered at the default strengths). We honor `resize:`
    (it matches the default in every shipped config) but keep the
    default color, matching the reference's actual train distribution."""
    transform = str(
        db_cfg.get("transform", db_cfg.get("transforms", "msc+color"))
    ).strip()
    if transform not in ("msc+color", "crop+color"):
        raise ValueError(
            f"unknown dataset transform {transform!r}: "
            "expected 'msc+color' or 'crop+color' "
            "(reference raises too, utils/eval_utils.py:86-87)"
        )
    if transform == "crop+color":
        resize = db_cfg.get("resize", 256)
        if isinstance(resize, (list, tuple)):
            resize = tuple(int(r) for r in resize)
        else:
            resize = (int(resize), int(resize))
        color = (0.4, 0.4, 0.4, 0.2)
    else:
        resize = (256, 256)
        color = tuple(db_cfg.get("color", (0.4, 0.4, 0.4, 0.2)))
    return PreprocessConfig(
        transform=transform,
        crop_size=int(db_cfg.get("crop_size", 224)),
        min_area=float(db_cfg.get("min_area", 0.08)),
        color=color,
        resize=resize,
        jitter_order=str(db_cfg.get("jitter_order", "canonical")),
        audio_fps=int(db_cfg.get("audio_fps", 24000)),
        n_fft=int(db_cfg.get("n_fft", 512)),
        spectrogram_fps=float(db_cfg.get("spectrogram_fps", 100.0)),
        audio_clip_duration=float(db_cfg.get("audio_clip_duration", 2.0)),
        video_dtype=str(db_cfg.get("video_dtype", "auto")),
    )


def build_dataset(
    db_cfg: Config,
    split_cfg: Config,
    mode: Optional[str] = None,
    return_audio: bool = True,
    return_labels: bool = False,
    fold: Optional[int] = None,
):
    """reference: utils/main_utils.py:138-212 (transform + dataset
    assembly) and utils/eval_utils.py:67-128 (benchmark variants).
    Decode-only on host; device preprocessing replaces transform objects."""
    name = db_cfg["name"]
    split = split_cfg["split"]
    if fold is not None:
        split = split.format(fold=fold)

    kwargs = dict(
        subset=split,
        root=db_cfg.get("root"),
        backend=db_cfg.get("backend", "auto"),
        mode=mode or split_cfg.get("mode", "clip"),
        return_video=True,
        video_clip_duration=float(
            db_cfg.get("video_clip_duration", db_cfg.get("clip_duration", 0.5))
        ),
        video_fps=float(db_cfg.get("video_fps", 16.0)),
        return_audio=return_audio,
        return_labels=return_labels,
        return_index=True,
        max_offsync_augm=0.5 if split_cfg.get("use_augmentation") and return_audio else 0.0,
        mode_clips_per_video=int(split_cfg.get("clips_per_video", 1)),
    )
    if return_audio:
        kwargs.update(
            audio_clip_duration=float(db_cfg.get("audio_clip_duration", 2.0)),
            audio_fps=int(db_cfg.get("audio_fps", 24000)),
        )
    if "synthetic_size" in db_cfg:
        kwargs["synthetic_size"] = int(db_cfg["synthetic_size"])
    if db_cfg.get("name") == "synthetic_av" and "num_classes" in db_cfg:
        # only the learnable synthetic dataset takes this constructor arg
        # (data/learnable.py); real datasets derive classes from listings
        kwargs["num_classes"] = int(db_cfg["num_classes"])
    if db_cfg.get("decode_size") is not None:
        # fixed decode size (H, W): real backends cover-scale+crop at
        # decode time so heterogeneous media yields static shapes for the
        # batch collate + jitted preprocessing (decode.scale_crop_frames)
        kwargs["decode_size"] = tuple(
            int(x) for x in db_cfg["decode_size"]
        )
    if db_cfg.get("anno_path") is not None:
        kwargs["anno_path"] = db_cfg["anno_path"]
    if db_cfg.get("cache_path") is not None and name == "audioset":
        kwargs["cache_path"] = db_cfg["cache_path"]
        kwargs.pop("anno_path", None)
    if name == "audioset":
        kwargs["return_labels"] = False  # AudioSet has no labels here
    return DATASETS.get(name)(**kwargs)


def build_dataloader(
    dataset,
    db_cfg: Config,
    split_cfg: Config,
    num_workers: int = 4,
    num_shards: int = 1,
    shard_index: int = 0,
    seed: int = 0,
    kind: str = "threaded",
):
    """reference: utils/main_utils.py:214-228 (DataLoader +
    DistributedSampler, per-process batch division).

    kind='native' selects the C++ shared-memory-ring multiprocess loader
    (true process parallelism for the numpy-heavy collate path — the
    GIL-free analogue of the reference's 36-72 DataLoader worker
    processes); 'threaded' is the in-process prefetcher. Config key:
    top-level `loader:` (see train/loop.py)."""
    common = dict(
        batch_size=int(db_cfg["batch_size"]) // max(num_shards, 1),
        shuffle=bool(split_cfg.get("use_shuffle", split_cfg.get("use_augmentation", True))),
        drop_last=bool(split_cfg.get("drop_last", True)),
        num_workers=num_workers,
        num_shards=num_shards,
        shard_index=shard_index,
        seed=seed,
    )
    if kind == "native":
        from avid_cma_tpu.data.loader import MultiprocessDataLoader

        loader = MultiprocessDataLoader(dataset, **common)
    elif kind == "threaded":
        loader = DataLoader(dataset, **common)
    elif kind == "cached":
        # decode-once replay (data/loader.py:CachedDataLoader): trades
        # per-epoch reshuffle for decode-free epochs — small corpora on
        # decode-bound hosts, and loop-overhead measurement
        from avid_cma_tpu.data.loader import CachedDataLoader

        loader = CachedDataLoader(DataLoader(dataset, **common))
    else:
        raise ValueError(
            f"unknown loader kind '{kind}' (threaded|native|cached)"
        )
    if len(loader) == 0:
        raise ValueError(
            f"empty loader: dataset has {len(dataset)} items but "
            f"batch_size={common['batch_size']} with "
            f"drop_last={common['drop_last']} yields zero batches"
        )
    return loader
