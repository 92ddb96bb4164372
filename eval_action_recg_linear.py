#!/usr/bin/env python
"""Frozen-feature linear probe eval (Kinetics-400, multi-tap).

Usage (reference CLI parity, eval-action-recg-linear.py:29-45; loops all
folds like the reference main):
    python eval_action_recg_linear.py <eval_cfg.yaml> <model_cfg.yaml>
"""

from avid_cma_tpu.cli import eval_arg_parser, parse_eval_args


def main():
    p = eval_arg_parser(__doc__)
    args, eval_cfg, model_cfg = parse_eval_args(p)

    from avid_cma_tpu.train.eval_loop import run_linear_probe

    num_folds = int(eval_cfg.dataset.get("num_folds", 1))
    for fold in range(1, num_folds + 1):
        results = run_linear_probe(eval_cfg, model_cfg, fold=fold, debug=args.debug)
        print(f"fold {fold}: {results}")


if __name__ == "__main__":
    main()
