"""Deployment inference CLI (scripts/classify.py): restore a finetuned
eval checkpoint and classify raw video files with the dense protocol.
The reference has no raw-media inference surface at all (its only
consumer of a finetuned model is the benchmark loop,
eval-action-recg.py:101-110); this pins the serve path end to end on the
synthetic backend."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "scripts"))

from test_eval_loops import finetune_cfg, model_cfg  # noqa: E402


def _finetuned_run(tmp_path):
    from avid_cma_tpu.train.eval_loop import run_action_recognition

    ecfg = finetune_cfg()
    mcfg = model_cfg(tmp_path)
    results = run_action_recognition(ecfg, mcfg, fold=1, debug=True)
    return ecfg, mcfg, results


def test_classify_videos_dense_protocol(tmp_path):
    import classify

    ecfg, mcfg, _ = _finetuned_run(tmp_path)
    paths = ["clipA.mp4", "clipB.mp4", "clipC.mp4"]
    probs, ckpt_kind = classify.classify_videos(
        ecfg, mcfg, paths, fold=1, which="best", clips=2
    )
    assert ckpt_kind == "orbax_best"
    assert probs.shape == (3, 101)
    # valid distributions, one per input video
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    assert (probs >= 0).all()
    # synthetic backend fabricates per-path content: distinct inputs must
    # not produce bit-identical distributions (a constant output would
    # mean the decode->preprocess->logits chain ignores the input)
    assert not np.allclose(probs[0], probs[1])

    # 'last' falls back to the per-epoch manager
    probs_last, kind_last = classify.classify_videos(
        ecfg, mcfg, paths[:1], fold=1, which="last", clips=2
    )
    assert kind_last == "orbax" and probs_last.shape == (1, 101)


def test_classify_cli_main(tmp_path):
    """argparse -> restore -> ranked class output, incl. --classes."""
    import subprocess

    import yaml

    ecfg, mcfg, _ = _finetuned_run(tmp_path)
    eval_yaml = tmp_path / "eval.yaml"
    model_yaml = tmp_path / "model.yaml"
    with open(eval_yaml, "w") as f:
        yaml.safe_dump(ecfg.to_dict() if hasattr(ecfg, "to_dict")
                       else _plain(ecfg), f)
    with open(model_yaml, "w") as f:
        yaml.safe_dump({"model": _plain(mcfg)}, f)
    names = tmp_path / "names.txt"
    names.write_text("\n".join(f"action{i:03d}" for i in range(101)))

    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "classify.py"),
         str(eval_yaml), str(model_yaml), "vidX.mp4",
         "--fold", "1", "--clips", "2", "--topk", "3",
         "--classes", str(names)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "checkpoint: orbax_best" in out.stdout
    assert "vidX.mp4:" in out.stdout and "action" in out.stdout


def _plain(cfg):
    """Config -> plain dict for yaml dumping."""
    from collections.abc import Mapping

    if isinstance(cfg, Mapping):
        return {k: _plain(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [_plain(v) for v in cfg]
    return cfg
