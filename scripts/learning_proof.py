#!/usr/bin/env python
"""End-to-end learning proof: pretrain -> transfer, above chance, or fail.

The reference's de-facto integration test is its published accuracy table
(reference README.md:21-26) — unreproducible on a host without media or
codecs. This is the framework's equivalent evidence: a short AVID
pretrain on the learnable synthetic A/V dataset (data/learnable.py —
labels recoverable from either modality, a per-instance latent shared
across modalities), then

  (a) cross-modal retrieval on UNSEEN instances in NCE space
      (scripts/extract_features.py --space nce + scripts/retrieval.py
      math): R@1 must beat chance by --r1-factor (alignment must
      GENERALIZE, not memorize bank rows), and
  (b) a linear probe on frozen pooled video features: top-1 must be
      >= --probe-factor x chance.

Catches sign/wiring/BN-mode bugs that parity tests structurally cannot.
Writes LEARNPROOF.json next to the repo root and exits nonzero on any
missed threshold. ~15 min single-chip cold, ~5 min with a warm compile
cache; pytest wraps this via tests/test_learning.py (TPU-gated — a CPU
step at this shape is ~10 s, see the test's skip note).

`--criterion avid_cma` proves the SECOND training stage end-to-end: the
AVID phase above (evaluated against the same gates, recorded as the
`avid` section), then an AVID_CMA phase warm-started from its orbax run
(weights + banks + Z — the torch-free analogue of the reference's
.pth.tar chain, criterions/avid_cma.py:308-319), with consensus mining
at init and every --resample-freq epochs. The CMA gates (`cma` section):

  * mined-positive label purity IN THE BANKS CMA MINES AT INIT (the
    AVID banks) >= --purity-factor x chance — the premise of positive-
    set expansion is that consensus mining finds same-class neighbors;
  * post-CMA probe top-1 >= --probe-factor x chance (class transfer is
    retained or improved — the metric CMA optimizes for);
  * post-CMA retrieval R@1 >= --cma-r1-factor x chance (default 2.0, a
    RETENTION gate, deliberately weaker than the AVID gate: positive-set
    expansion trades instance-level cross-modal alignment for
    within-modal class structure, so instance retrieval softens as class
    transfer holds — measured at scale-matched selectivity via --pos-k).

Calibration note (recorded from the first on-chip run): pos_k=4 on a
128-instance corpus is top-3.1% selectivity — 225x LESS selective than
the reference's top-32-of-232k (0.014%) — and 160 epochs of it at the
AVID lr washed instance alignment to chance while the probe held at
6.1x chance. The defaults below match selectivity (pos_k=2) and dose
(60 epochs at lr/5) to the corpus scale. Writes LEARNPROOF_CMA.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_cfg(args, name=None, loss=None, model_ckpt=None, epochs=None,
              lr=None):
    import avid_cma_tpu  # noqa: F401  (registries)
    from avid_cma_tpu.config import _wrap

    model_args = {
        "proj_dim": [512, 512, 128],
        "video_backbone": "R2Plus1D",
        "video_backbone_args": {"depth": 10},
        "audio_backbone": "Conv2D",
        "audio_backbone_args": {"depth": 10},
    }
    if model_ckpt is not None:
        model_args["checkpoint"] = model_ckpt
    return _wrap({
        "seed": 0, "num_workers": 2, "print_freq": 32, "log2tb": False,
        "resume": args.resume, "quiet": not args.verbose,
        "dataset": {
            "name": "synthetic_av",
            "num_classes": args.classes,
            "jitter_order": args.jitter_order,
            "synthetic_size": args.train_size,
            "batch_size": args.batch,
            "video_clip_duration": 0.5,
            "video_fps": 16.0,
            "crop_size": args.crop,
            "audio_clip_duration": 1.0,
            "audio_fps": 24000.0,
            "spectrogram_fps": 100.0,
            "n_fft": 512,
            "train": {"split": "train", "use_augmentation": True,
                      "drop_last": True, "clips_per_video": 1},
            "test": {"split": "test", "mode": "clip", "clips_per_video": 1,
                     "use_augmentation": False, "use_shuffle": False,
                     "drop_last": False},
        },
        "optimizer": {
            "name": "adam", "weight_decay": 1e-5,
            "num_epochs": epochs if epochs is not None else args.epochs,
            "lr": {"name": "multistep",
                   "base_lr": lr if lr is not None else args.lr,
                   "gamma": 1.0, "milestones": [10 ** 6]},
        },
        "model": {
            "name": name if name is not None else args.name,
            "model_dir": args.model_dir,
            "arch": "av_wrapper",
            "dtype": args.dtype,
            "args": model_args,
        },
        "loss": loss if loss is not None else {
            "name": "AVID",
            "args": {"num_data": args.train_size,
                     "num_negatives": args.negatives,
                     "momentum": 0.5, "xModal_coeff": 1.0,
                     "wModal_coeff": 0.0},
        },
    })


def cma_loss_cfg(args, avid_orbax):
    """AVID_CMA loss section warm-started (banks + Z) from the AVID
    phase's orbax run — the torch-free chain the flagship AVID-CMA
    configs express with .pth.tar paths (reference
    criterions/avid_cma.py:308-319). Flagship head coefficients
    (xModalInst=1, wModalPos=1); pos_k/negatives scaled to the synthetic
    corpus."""
    return {
        "name": "AVID_CMA",
        "args": {
            "checkpoint": avid_orbax,
            "num_data": args.train_size,
            "momentum": 0.5,
            "num_negatives": args.negatives,
            "num_negatives_within": max(args.negatives // 2, 8),
            "xModalInstCoeff": 1.0,
            "wModalInstCoeff": 0.0,
            "xModalPosCoeff": 0.0,
            "wModalPosCoeff": 1.0,
            "resample_freq": args.resample_freq,
            "sampling_args": {"type": "consensus", "pos_k": args.pos_k},
        },
    }


def mined_purity(run_dir, args):
    """Label purity of the positive set mined from the FINAL banks: the
    fraction of each instance's pos_k consensus neighbors that share its
    class. Labels are index % classes (data/learnable.py), so purity is
    computable without touching the dataset. Chance = same-class others /
    all others."""
    from avid_cma_tpu.criterions.mining import mine_positives
    from avid_cma_tpu.train.checkpoint import import_criterion_orbax

    bank = import_criterion_orbax(os.path.join(run_dir, "orbax"))
    pos = np.asarray(mine_positives(
        bank.view1_mem, bank.view2_mem, pos_k=args.pos_k, kind="consensus"
    ))
    labels = np.arange(args.train_size) % args.classes
    purity = float((labels[pos] == labels[:, None]).mean())
    per_class = args.train_size // args.classes
    chance = (per_class - 1) / (args.train_size - 1)
    return purity, chance


def run_proof(args) -> dict:
    from avid_cma_tpu.config import _wrap
    from avid_cma_tpu.train.loop import run_pretraining
    from scripts.extract_features import extract_features
    from scripts.retrieval import recall_metrics

    cma = args.criterion == "avid_cma"
    avid_name = args.name + "-avid" if cma else args.name
    run_dirs = [os.path.join(args.model_dir, avid_name)]
    if cma:
        run_dirs.append(os.path.join(args.model_dir, args.name))
    if args.resume:
        if not os.path.isdir(run_dirs[0]):
            sys.exit(f"--resume: no existing run at {run_dirs[0]}")
    else:
        # the proof must certify THIS code: a leftover completed run
        # would make run_pretraining restore at the final step, train
        # zero batches, and evaluate stale weights as fresh evidence
        import shutil

        for d in run_dirs:
            if os.path.isdir(d):
                shutil.rmtree(d)

    def evaluate(cfg):
        """Cross-modal retrieval on UNSEEN instances (NCE space) + a
        closed-form ridge linear probe on frozen pooled video features
        (deterministic, no second training loop to tune)."""
        db = cfg["dataset"]

        def _extract(split, size, space, taps=("pool",)):
            sdb = dict(db)
            sdb["synthetic_size"] = size
            sdb["test"] = {"split": split, "mode": "clip",
                           "clips_per_video": 1, "use_augmentation": False,
                           "use_shuffle": False, "drop_last": False}
            return extract_features(
                _wrap({"dataset": sdb}), cfg["model"], split="test",
                space=space, taps=taps, num_workers=2,
            )

        feats, _, _ = _extract("test", args.test_size, "nce")
        v, a = feats["video"], feats["audio"]
        retrieval = {
            "v2a": recall_metrics(v, a, (1, 5)),
            "a2v": recall_metrics(a, v, (1, 5)),
        }
        n = v.shape[0]
        ftr, ytr, _ = _extract("train", args.train_size, "taps")
        fte, yte, _ = _extract("test", args.test_size, "taps")
        Xtr, Xte = ftr["pool"], fte["pool"]
        mu, sd = Xtr.mean(0), Xtr.std(0) + 1e-6
        Xtr, Xte = (Xtr - mu) / sd, (Xte - mu) / sd
        Y = np.eye(args.classes)[ytr]
        W = np.linalg.solve(
            Xtr.T @ Xtr + 10.0 * np.eye(Xtr.shape[1]), Xtr.T @ Y
        )
        probe_acc = float(((Xte @ W).argmax(1) == yte).mean())
        return {
            "retrieval": {k: {m: float(x) for m, x in d.items()}
                          for k, d in retrieval.items()},
            "chance_r1_pct": round(100.0 / n, 3),
            "probe_top1": round(probe_acc, 4),
            "chance_top1": round(1.0 / args.classes, 4),
            "test_instances": n,
        }

    def gates(m, r1_factor):
        r1_min = min(m["retrieval"]["v2a"]["R@1"],
                     m["retrieval"]["a2v"]["R@1"])
        return {
            "pass_retrieval": bool(
                r1_min >= r1_factor * m["chance_r1_pct"]
            ),
            "pass_probe": bool(
                m["probe_top1"] >= args.probe_factor * m["chance_top1"]
            ),
        }

    t0 = time.time()
    avid_cfg = build_cfg(args, name=avid_name)
    run_pretraining(avid_cfg)
    avid_wall = time.time() - t0
    avid_metrics = evaluate(avid_cfg)
    avid_metrics.update(gates(avid_metrics, args.r1_factor))

    if not cma:
        result = {
            "criterion": args.criterion,
            "pretrain_wall_sec": round(avid_wall, 1),
            "resumed": bool(args.resume),
            "epochs": args.epochs,
            "train_instances": args.train_size,
            "thresholds": {"r1_factor": args.r1_factor,
                           "probe_factor": args.probe_factor},
            **avid_metrics,
        }
        result["pass"] = (result["pass_retrieval"]
                          and result["pass_probe"])
        return result

    # mining premise, measured on the banks CMA actually mines at init
    # (the AVID banks): consensus neighbors must be same-class well
    # above chance BEFORE any positive-expansion training
    purity_init, chance_p = mined_purity(run_dirs[0], args)

    # phase 2: AVID_CMA warm-started from phase 1 (weights + banks + Z
    # via the orbax run dir), positive set mined from the banks, re-mined
    # every resample_freq epochs, at the (gentler) CMA lr
    t0 = time.time()
    avid_orbax = os.path.join(args.model_dir, avid_name, "orbax")
    cma_cfg = build_cfg(
        args, loss=cma_loss_cfg(args, avid_orbax),
        model_ckpt=avid_orbax, epochs=args.cma_epochs, lr=args.cma_lr,
    )
    run_pretraining(cma_cfg)
    cma_wall = time.time() - t0
    cma_metrics = evaluate(cma_cfg)
    cma_metrics.update(gates(cma_metrics, args.cma_r1_factor))
    purity_final, _ = mined_purity(run_dirs[1], args)

    cma_section = {
        "cma_epochs": args.cma_epochs,
        "cma_lr": args.cma_lr,
        "pos_k": args.pos_k,
        "mined_purity_init": round(purity_init, 4),
        "mined_purity_final": round(purity_final, 4),
        "chance_purity": round(chance_p, 4),
        "pass_mining": bool(purity_init >= args.purity_factor * chance_p),
        **cma_metrics,
    }
    result = {
        "criterion": args.criterion,
        "pretrain_wall_sec": round(avid_wall + cma_wall, 1),
        "resumed": bool(args.resume),
        "epochs": args.epochs,
        "train_instances": args.train_size,
        "thresholds": {"r1_factor": args.r1_factor,
                       "cma_r1_factor": args.cma_r1_factor,
                       "probe_factor": args.probe_factor,
                       "purity_factor": args.purity_factor},
        "avid": avid_metrics,
        "cma": cma_section,
    }
    result["pass"] = bool(
        avid_metrics["pass_retrieval"] and avid_metrics["pass_probe"]
        and cma_section["pass_mining"] and cma_section["pass_retrieval"]
        and cma_section["pass_probe"]
    )
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--criterion", choices=["avid", "avid_cma"],
                    default="avid",
                    help="avid_cma: AVID phase (--epochs) then an "
                         "AVID_CMA phase (--cma-epochs) warm-started "
                         "from it, with a mined-positive label-purity "
                         "gate on top of the transfer gates")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--cma-epochs", type=int, default=60)
    ap.add_argument("--cma-lr", type=float, default=2e-4,
                    help="CMA-phase lr (gentler than the AVID phase: the "
                         "corpus is tiny and the model converged — see "
                         "the calibration note above)")
    ap.add_argument("--cma-r1-factor", type=float, default=2.0,
                    help="post-CMA retrieval retention gate (x chance)")
    ap.add_argument("--pos-k", type=int, default=2,
                    help="mined positives per instance; top pos_k/(N-1) "
                         "selectivity — keep small on tiny corpora")
    ap.add_argument("--resample-freq", type=int, default=40)
    ap.add_argument("--purity-factor", type=float, default=2.0,
                    help="mined same-class purity must be >= this x "
                         "chance (avid_cma only)")
    ap.add_argument("--train-size", type=int, default=128)
    ap.add_argument("--test-size", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=56)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--negatives", type=int, default=64)
    ap.add_argument("--name", default="learning-proof")
    ap.add_argument("--model-dir", default="/tmp/avid_cma_tpu/checkpoints")
    ap.add_argument("--r1-factor", type=float, default=5.0,
                    help="retrieval R@1 must be >= this x chance")
    ap.add_argument("--probe-factor", type=float, default=3.0,
                    help="probe top-1 must be >= this x chance")
    ap.add_argument("--out", default=None,
                    help="artifact path (default LEARNPROOF.json, or "
                         "LEARNPROOF_CMA.json for --criterion avid_cma)")
    ap.add_argument("--resume", action="store_true",
                    help="continue an interrupted run instead of starting "
                         "fresh (default wipes the run dir: the artifact "
                         "must certify the current code, and resuming a "
                         "COMPLETED run would evaluate stale weights)")
    ap.add_argument("--dtype", choices=["float32", "bfloat16", "auto"],
                    default="float32",
                    help="model computation dtype for the proof. Default "
                         "float32: the proof's instance latent is a "
                         "1/128-resolution continuous scalar (sub-"
                         "spectrogram-bin audio frequency, 5-degree/clip "
                         "grating phase) — a deliberately precision-hard "
                         "diagnostic that bf16 backbones cannot thread "
                         "through 10 conv layers (measured: bf16 probe "
                         "transfer is fine at 6.6x chance but instance "
                         "retrieval collapses; LEARNPROOF_BF16.json). "
                         "Real corpora separate instances by gross "
                         "appearance; bf16 stays the production default "
                         "with the bf16 probe gate as its evidence")
    ap.add_argument("--jitter-order", choices=["canonical", "random"],
                    default="canonical",
                    help="color-jitter op order for the pretrain phase "
                         "(the A/B knob behind PARITY.md divergence #1: "
                         "'random' is the reference's per-clip shuffled "
                         "order, 'canonical' the fast fixed order)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)
    if args.out is None:
        fname = ("LEARNPROOF_CMA.json" if args.criterion == "avid_cma"
                 else "LEARNPROOF.json")
        args.out = os.path.join(REPO, fname)
    if args.name == "learning-proof" and args.criterion == "avid_cma":
        args.name = "learning-proof-cma"

    result = run_proof(args)
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
