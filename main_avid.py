#!/usr/bin/env python
"""AVID / AVID-CMA pretraining entry point.

Usage (reference CLI parity, main-avid.py:24-45):
    python main_avid.py configs/main/avid/kinetics/Cross-N1024.yaml
    python main_avid.py <cfg.yaml> --debug --set dataset.backend=synthetic

Distributed-flag differences vs the reference: NCCL rendezvous flags
(--dist-url/--rank/...) are unnecessary on TPU — `jax.distributed`
self-coordinates; a single process drives all local devices.
"""

import argparse

from avid_cma_tpu import config as config_lib
from avid_cma_tpu.parallel.mesh import initialize_multihost


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cfg", help="YAML config (reference schema)")
    p.add_argument("--debug", action="store_true",
                   help="tiny batch, 1 worker, 2 epochs (reference --debug)")
    p.add_argument("--quiet", action="store_true",
                   help="suppress stdout/file logging (reference --quiet)")
    p.add_argument("--seed", type=int, default=None,
                   help="override the config seed (reference --seed)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted config overrides")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host runs")
    return p.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        initialize_multihost(required=True)
    overrides = list(args.overrides)
    if args.quiet:
        overrides.append("quiet=true")
    if args.seed is not None:
        overrides.append(f"seed={args.seed}")
    cfg = config_lib.load(args.cfg, overrides=overrides)

    from avid_cma_tpu.train.loop import run_pretraining

    run_pretraining(cfg, debug=args.debug)


if __name__ == "__main__":
    main()
