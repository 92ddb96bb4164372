#!/usr/bin/env python
"""Frozen-feature linear probe eval (Kinetics-400, multi-tap).

Usage (reference CLI parity, eval-action-recg-linear.py:29-45; loops all
folds like the reference main):
    python eval_action_recg_linear.py <eval_cfg.yaml> <model_cfg.yaml>
"""

import argparse

from avid_cma_tpu import config as config_lib


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("eval_cfg")
    p.add_argument("model_cfg")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--test-only", dest="test_only", action="store_true",
                   help="skip training; evaluate the saved checkpoint")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host runs")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args()
    if args.multihost:
        from avid_cma_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(required=True)
    # flag parity with the reference CLI (eval-action-recg.py:21-24);
    # the loops read these as config keys
    for flag in ("test_only", "resume", "quiet"):
        if getattr(args, flag):
            args.overrides.append(f"{flag}=true")

    eval_cfg = config_lib.load(args.eval_cfg, overrides=args.overrides)
    model_cfg = config_lib.load(args.model_cfg).model

    from avid_cma_tpu.train.eval_loop import run_linear_probe

    num_folds = int(eval_cfg.dataset.get("num_folds", 1))
    for fold in range(1, num_folds + 1):
        results = run_linear_probe(eval_cfg, model_cfg, fold=fold, debug=args.debug)
        print(f"fold {fold}: {results}")


if __name__ == "__main__":
    main()
