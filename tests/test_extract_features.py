"""Feature-extraction entry point (scripts/extract_features.py): a
pretrained backbone's `return_embs` taps (reference models/video.py:44-54,
consumed only inside utils/eval_utils.py wrappers there) exposed as a
standalone extraction surface writing per-item/per-video embeddings."""

import os
import subprocess
import sys

import jax
import numpy as np
import yaml

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)
sys.path.insert(0, os.path.dirname(SCRIPTS))


MODEL_ARGS = {
    "proj_dim": [64, 32],
    "video_backbone": "R2Plus1D",
    "video_backbone_args": {"depth": 10},
    "audio_backbone": "Conv2D",
    "audio_backbone_args": {"depth": 10},
}


def _fabricate_checkpoint(model_dir: str, name: str = "smoke"):
    """An orbax pretrain checkpoint holding a freshly initialized
    av_wrapper's variables (the sub-tree _load_backbone extracts)."""
    from avid_cma_tpu.registry import MODELS
    from avid_cma_tpu.train.checkpoint import CheckpointManager

    model = MODELS.get("av_wrapper")(**MODEL_ARGS)
    video = np.zeros((1, 2, 32, 32, 3), np.float32)
    audio = np.zeros((1, 64, 65, 1), np.float32)
    variables = model.init(jax.random.key(3), video, audio, train=False)
    mgr = CheckpointManager(os.path.join(model_dir, name, "orbax"))
    mgr.save(
        0,
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables.get("batch_stats", {}))},
        wait=True,
    )


def _write_cfgs(tmp_path, dense: bool):
    test = {"split": "testlist{fold:02d}", "mode": "clip",
            "clips_per_video": 1, "use_augmentation": False,
            "use_shuffle": False, "drop_last": False}
    if dense:
        test = {**test, "mode": "video", "clips_per_video": 2}
    data = {
        "dataset": {
            "name": "ucf101", "backend": "synthetic", "synthetic_size": 8,
            "fold": 1, "batch_size": 4, "clip_duration": 0.25,
            "video_fps": 8.0, "crop_size": 32,
            "test": test,
        },
    }
    model = {"model": {"name": "smoke", "model_dir": str(tmp_path),
                       "arch": "av_wrapper", "args": MODEL_ARGS}}
    dpath, mpath = tmp_path / "data.yaml", tmp_path / "model.yaml"
    dpath.write_text(yaml.safe_dump(data))
    mpath.write_text(yaml.safe_dump(model))
    return str(dpath), str(mpath)


def test_extract_features_cli_clip_mode(tmp_path):
    _fabricate_checkpoint(str(tmp_path))
    dpath, mpath = _write_cfgs(tmp_path, dense=False)
    out = tmp_path / "feats.npz"
    repo = os.path.dirname(SCRIPTS)
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "extract_features.py"),
         dpath, mpath, "--split", "test", "--taps", "pool", "conv5x",
         "--fold", "1", "--out", str(out), "--max-items", "6",
         "--num-workers", "1"],
        cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    z = np.load(out)
    assert z["feat_pool"].shape == (6, 512)
    assert z["feat_conv5x"].shape == (6, 512)  # max-pooled conv tap
    assert z["label"].shape == (6,) and z["index"].shape == (6,)
    assert np.all(np.isfinite(z["feat_pool"]))
    # different videos -> different embeddings (decode + model both live)
    assert not np.allclose(z["feat_pool"][0], z["feat_pool"][1])


def test_extract_features_nce_space(tmp_path):
    """--space nce: L2-normalized projection-head embeddings of both
    modalities (the memory-bank space, reference criterions/avid.py:47-56)
    on an audio-bearing dataset."""
    from avid_cma_tpu import config as config_lib
    from scripts.extract_features import extract_features

    _fabricate_checkpoint(str(tmp_path))
    data = {
        "dataset": {
            "name": "kinetics", "backend": "synthetic",
            "synthetic_size": 8, "batch_size": 4,
            "video_clip_duration": 0.25, "video_fps": 8.0,
            "crop_size": 32, "audio_clip_duration": 0.5,
            "audio_fps": 24000, "n_fft": 512, "spectrogram_fps": 100.0,
            "test": {"split": "test", "mode": "clip", "clips_per_video": 1,
                     "use_augmentation": False, "use_shuffle": False,
                     "drop_last": False},
        },
    }
    _, mpath = _write_cfgs(tmp_path, dense=False)
    dpath = tmp_path / "data_kinetics.yaml"
    dpath.write_text(yaml.safe_dump(data))
    data_cfg = config_lib.load(str(dpath))
    model_cfg = config_lib.load(mpath).model
    feats, labels, indices = extract_features(
        data_cfg, model_cfg, split="test", space="nce",
        max_items=4, num_workers=1,
    )
    assert set(feats) == {"video", "audio"}
    assert feats["video"].shape == (4, 32)  # proj_dim tail
    assert feats["audio"].shape == (4, 32)
    for m in ("video", "audio"):
        np.testing.assert_allclose(
            np.linalg.norm(feats[m], axis=-1), 1.0, rtol=1e-4
        )
    assert not np.allclose(feats["video"][0], feats["video"][1])


def test_extract_features_dense_video_mode(tmp_path):
    """'video' mode items carry (clips, T, H, W, C); embeddings are the
    mean over the uniformly spaced clips (dense-eval protocol)."""
    from avid_cma_tpu import config as config_lib
    from scripts.extract_features import extract_features

    _fabricate_checkpoint(str(tmp_path))
    dpath, mpath = _write_cfgs(tmp_path, dense=True)
    data_cfg = config_lib.load(dpath)
    model_cfg = config_lib.load(mpath).model
    feats, labels, indices = extract_features(
        data_cfg, model_cfg, split="test", taps=("pool",), fold=1,
        max_items=3, num_workers=1,
    )
    assert feats["pool"].shape == (3, 512)
    assert labels is not None and labels.shape == (3,)
    assert indices.shape == (3,)
    assert np.all(np.isfinite(feats["pool"]))
