#!/usr/bin/env python
"""Checkpoint tooling: download released reference checkpoints and/or
convert between `.pth.tar` and this framework's formats.

Capability reference: download_checkpoints.sh (wget of the 4 released
AVID/AVID-CMA checkpoints into checkpoints/{AVID,AVID-CMA}/{Kinetics,
Audioset}/<name>/checkpoint.pth.tar — paths match the configs' model_dir
+ name).

Usage:
  python scripts/checkpoints.py download [--dest checkpoints]
  python scripts/checkpoints.py inspect  <ckpt.pth.tar>
  python scripts/checkpoints.py convert  <ckpt.pth.tar> <out_dir>   # -> orbax-friendly npz
  python scripts/checkpoints.py export   <npz_or_orbax> <out.pth.tar>
"""

import argparse
import os
import subprocess
import sys

# `python scripts/checkpoints.py ...` puts scripts/ (not the repo root)
# on sys.path; the converters import avid_cma_tpu
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RELEASED = {
    "AVID/Kinetics/Cross-N1024": "https://dl.fbaipublicfiles.com/avid-cma/checkpoints/AVID_Kinetics_Cross-N1024_checkpoint.pth.tar",
    "AVID/Audioset/Cross-N1024": "https://dl.fbaipublicfiles.com/avid-cma/checkpoints/AVID_Audioset_Cross-N1024_checkpoint.pth.tar",
    "AVID-CMA/Kinetics/InstX-N1024-PosW-N64-Top32": "https://dl.fbaipublicfiles.com/avid-cma/checkpoints/AVID-CMA_Kinetics_InstX-N1024-PosW-N64-Top32_checkpoint.pth.tar",
    "AVID-CMA/Audioset/InstX-N1024-PosW-N64-Top32": "https://dl.fbaipublicfiles.com/avid-cma/checkpoints/AVID-CMA_Audioset_InstX-N1024-PosW-N64-Top32_checkpoint.pth.tar",
}


def cmd_download(args):
    for rel, url in RELEASED.items():
        dest = os.path.join(args.dest, rel, "checkpoint.pth.tar")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if os.path.isfile(dest):
            print(f"exists: {dest}")
            continue
        print(f"fetching {url} -> {dest}")
        # download to a temp name and rename on success: wget -O creates
        # dest before fetching, and a failed run would leave a partial
        # file that every later run skips as 'exists'
        tmp = dest + ".part"
        try:
            subprocess.run(["wget", "-q", "-O", tmp, url], check=True)
            os.replace(tmp, dest)
        finally:
            if os.path.isfile(tmp):
                os.remove(tmp)


def cmd_inspect(args):
    import torch

    ckp = torch.load(args.path, map_location="cpu", weights_only=False)
    print("keys:", list(ckp.keys()))
    for section in ("model", "train_criterion"):
        if section in ckp:
            sd = ckp[section]
            print(f"[{section}] {len(sd)} tensors")
            for k, v in list(sd.items())[:8]:
                print(f"  {k}: {tuple(v.shape)} {v.dtype}")


def cmd_convert(args):
    import numpy as np

    from avid_cma_tpu.train.checkpoint import (
        import_criterion_pth_tar,
        import_model_pth_tar,
    )

    variables = import_model_pth_tar(args.path)
    os.makedirs(args.out, exist_ok=True)
    import jax

    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    np.savez(os.path.join(args.out, "model.npz"), **flat)
    try:
        bank = import_criterion_pth_tar(args.path)
        np.savez(
            os.path.join(args.out, "criterion.npz"),
            view1_mem=np.asarray(bank.view1_mem),
            view2_mem=np.asarray(bank.view2_mem),
            z=np.asarray(bank.z),
        )
    except KeyError:
        print("no train_criterion section; model only")
    print(f"wrote {args.out}/model.npz")


def _load_run_config(path):
    """The run's resolved config.yaml (dumped by run_pretraining next to
    orbax/), searched at `path` and its parent. None if absent."""
    import yaml

    for d in (path, os.path.dirname(os.path.abspath(path))):
        cand = os.path.join(d, "config.yaml")
        if os.path.isfile(cand):
            with open(cand) as f:
                return yaml.safe_load(f)
    return None


def cmd_export(args):
    """Framework orbax pretrain run -> reference-format `.pth.tar`
    (model + Adam moments + banks/Z; dict schema
    utils/main_utils.py:271-287), resumable by the reference."""
    import jax.numpy as jnp

    from avid_cma_tpu.criterions.avid import BankState
    from avid_cma_tpu.train.checkpoint import (
        _restore_raw_orbax,
        export_pth_tar,
        find_adam_state,
    )

    raw = _restore_raw_orbax(args.path)
    run_cfg = _load_run_config(args.path)
    variables = {
        "params": raw["params"],
        "batch_stats": raw.get("batch_stats", {}),
    }
    num_data = args.num_data
    if num_data is None and run_cfg is not None:
        num_data = run_cfg.get("loss", {}).get("args", {}).get("num_data")
    bank = None
    if raw.get("bank") is not None:
        b = raw["bank"]
        v1 = jnp.asarray(b["view1_mem"])
        v2 = jnp.asarray(b["view2_mem"])
        # a sharded-bank run stores mesh-padded rows; the reference's
        # buffers are sized exactly num_data, so trim before export
        if num_data is not None and v1.shape[0] > int(num_data):
            print(f"trimming banks {v1.shape[0]} -> {num_data} rows "
                  "(sharded-run padding)")
            v1, v2 = v1[: int(num_data)], v2[: int(num_data)]
        elif num_data is None:
            print("note: no run config.yaml / --num-data; exporting bank "
                  "rows as stored (sharded runs carry mesh-padding the "
                  "reference cannot load)")
        bank = BankState(view1_mem=v1, view2_mem=v2,
                         z=jnp.asarray(b["z"], jnp.float32))
    opt_state = raw.get("opt_state")
    if opt_state is not None and find_adam_state(opt_state) is None:
        print("note: no Adam moments in opt_state; exporting model only")
        opt_state = None
    # param_group hyperparameters: CLI flags win, else the run's config,
    # else refuse to invent values the reference would silently adopt
    hp = {}
    if run_cfg is not None:
        opt = run_cfg.get("optimizer", {})
        if "lr" in opt and "base_lr" in opt["lr"]:
            hp["lr"] = float(opt["lr"]["base_lr"])
        if "weight_decay" in opt:
            hp["weight_decay"] = float(opt["weight_decay"])
    if args.lr is not None:
        hp["lr"] = args.lr
    if args.weight_decay is not None:
        hp["weight_decay"] = args.weight_decay
    if opt_state is not None and ("lr" not in hp or "weight_decay" not in hp):
        sys.exit("error: optimizer export needs lr/weight_decay — pass "
                 "--lr/--weight-decay or export from a model_dir whose "
                 "config.yaml records them (the reference's resume adopts "
                 "whatever param_group values are written here)")
    export_pth_tar(
        variables, args.out, bank=bank, epoch=int(raw.get("epoch", 0)),
        opt_state=opt_state, opt_hparams=hp,
    )
    print(f"wrote {args.out}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("download")
    d.add_argument("--dest", default="checkpoints")
    d.set_defaults(fn=cmd_download)
    i = sub.add_parser("inspect")
    i.add_argument("path")
    i.set_defaults(fn=cmd_inspect)
    c = sub.add_parser("convert")
    c.add_argument("path")
    c.add_argument("out")
    c.set_defaults(fn=cmd_convert)
    e = sub.add_parser("export")
    e.add_argument("path", help="model_dir or orbax dir of a pretrain run")
    e.add_argument("out", help="output .pth.tar")
    e.add_argument("--lr", type=float, default=None,
                   help="param_group lr recorded in the export")
    e.add_argument("--weight-decay", dest="weight_decay", type=float,
                   default=None)
    e.add_argument("--num-data", dest="num_data", type=int, default=None,
                   help="corpus size; trims sharded-run bank padding "
                        "(default: the run config.yaml's loss.args.num_data)")
    e.set_defaults(fn=cmd_export)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
