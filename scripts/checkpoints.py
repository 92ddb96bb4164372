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
        subprocess.run(["wget", "-q", "-O", dest, url], check=True)


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


def cmd_export(args):
    print("use avid_cma_tpu.train.checkpoint.export_pth_tar from a train "
          "state; standalone export requires the model config to rebuild "
          "the variable tree.")
    sys.exit(2)


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
    e.set_defaults(fn=cmd_export)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
