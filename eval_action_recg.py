#!/usr/bin/env python
"""Full-finetune action recognition eval (UCF-101 / HMDB-51).

Usage (reference CLI parity, eval-action-recg.py:29-44):
    python eval_action_recg.py <eval_cfg.yaml> <model_cfg.yaml> [--fold N]
"""

from avid_cma_tpu.cli import eval_arg_parser, parse_eval_args


def main():
    p = eval_arg_parser(__doc__)
    p.add_argument("--fold", type=int, default=None)
    args, eval_cfg, model_cfg = parse_eval_args(p)

    from avid_cma_tpu.train.eval_loop import run_action_recognition

    results = run_action_recognition(
        eval_cfg, model_cfg, fold=args.fold, debug=args.debug
    )
    print(results)


if __name__ == "__main__":
    main()
