"""Cross-modal retrieval metrics (scripts/retrieval.py) over the
extract_features --space nce output format: rank math, tie
pessimism, and the CLI JSON surface."""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "scripts"))

import retrieval  # noqa: E402


def _unit(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_perfect_alignment():
    rng = np.random.default_rng(0)
    v = _unit(rng.normal(size=(32, 16)).astype(np.float32))
    m = retrieval.recall_metrics(v, v.copy())
    assert m["R@1"] == 100.0 and m["median_rank"] == 1.0


def test_noisy_alignment_beats_permuted():
    rng = np.random.default_rng(1)
    v = _unit(rng.normal(size=(64, 32)).astype(np.float32))
    a = _unit(v + 0.1 * rng.normal(size=v.shape).astype(np.float32))
    aligned = retrieval.recall_metrics(v, a)
    assert aligned["R@1"] > 90.0
    perm = np.roll(a, 1, axis=0)  # every true pair misaligned
    shuffled = retrieval.recall_metrics(v, perm)
    assert shuffled["R@1"] < aligned["R@1"]
    # recall monotone in k
    assert aligned["R@1"] <= aligned["R@5"] <= aligned["R@10"]


def test_constant_embeddings_score_pessimistically():
    """All-tied scores must NOT yield R@1=100 (rank counts every
    equal-scoring impostor above the true match)."""
    v = np.ones((16, 8), np.float32) / np.sqrt(8)
    m = retrieval.recall_metrics(v, v.copy())
    assert m["R@1"] == 0.0 and m["median_rank"] == 16.0


def test_cli_json(tmp_path):
    rng = np.random.default_rng(2)
    v = _unit(rng.normal(size=(24, 8)).astype(np.float32))
    path = tmp_path / "feats.npz"
    np.savez(path, feat_video=v, feat_audio=v.copy(),
             index=np.arange(24))
    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "retrieval.py"),
         str(path), "--ks", "1", "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip())
    assert res["v2a"]["R@1"] == 100.0 and res["a2v"]["R@2"] == 100.0
    assert res["v2a"]["n"] == 24


def test_missing_modality_error(tmp_path):
    path = tmp_path / "taps.npz"
    np.savez(path, feat_pool=np.zeros((4, 8), np.float32))
    try:
        retrieval.evaluate(str(path))
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "space nce" in str(e)
