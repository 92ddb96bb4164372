"""Shared CLI plumbing for the eval entry points.

Both eval CLIs take (eval_cfg, model_cfg) plus the same flag set
(reference parity: eval-action-recg.py:21-28, eval-action-recg-linear.py
:21-28); keeping the block here prevents the two scripts from silently
desynchronizing.
"""

from __future__ import annotations

import argparse
from typing import Tuple

from avid_cma_tpu import config as config_lib
from avid_cma_tpu.config import Config


def eval_arg_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
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
    return p


def parse_eval_args(
    p: argparse.ArgumentParser,
) -> Tuple[argparse.Namespace, Config, Config]:
    """Parse, init multihost if requested (failures raise — an explicit
    --multihost must not degrade silently), fold the boolean flags into
    config overrides (the loops read them as config keys), and load both
    configs. Returns (args, eval_cfg, model_cfg)."""
    args = p.parse_args()
    if args.multihost:
        from avid_cma_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(required=True)
    for flag in ("test_only", "resume", "quiet"):
        if getattr(args, flag):
            args.overrides.append(f"{flag}=true")
    eval_cfg = config_lib.load(args.eval_cfg, overrides=args.overrides)
    model_cfg = config_lib.load(args.model_cfg).model
    return args, eval_cfg, model_cfg
