"""Optimizer builders (optax) with torch-equivalent semantics.

Capability reference: utils/main_utils.py:240-262 — SGD(momentum=0.9,
nesterov per cfg) / Adam, both with *coupled* L2 weight decay (torch adds
wd*param to the gradient before the moment updates), and a MultiStepLR
schedule stepped per epoch.

Note the reference quirk (do not "fix" silently): the main pretrain
configs use gamma=1.0, i.e. constant LR — milestones only trigger
checkpoint copies (SURVEY §5).
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_schedule(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """torch MultiStepLR stepped per epoch, expressed in optimizer steps."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def build_optimizer(
    name: str,
    lr_schedule: optax.Schedule | float,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """Adam/SGD with coupled weight decay, matching torch.optim semantics
    (reference: utils/main_utils.py:243-255)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    name = name.lower()
    if name == "adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "sgd":
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    else:
        raise ValueError(f"unknown optimizer '{name}' (adam|sgd)")
    if callable(lr_schedule):
        parts.append(optax.scale_by_schedule(lambda c: -lr_schedule(c)))
    else:
        parts.append(optax.scale(-float(lr_schedule)))
    return optax.chain(*parts)


def build_from_config(opt_cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """Build from a reference-format YAML optimizer block
    (configs/main/avid/kinetics/Cross-N1024.yaml optimizer section)."""
    lr_cfg = opt_cfg["lr"]
    if lr_cfg.get("name", "multistep") == "multistep":
        sched = multistep_schedule(
            base_lr=float(lr_cfg["base_lr"]),
            milestones=lr_cfg.get("milestones", []),
            gamma=float(lr_cfg.get("gamma", 1.0)),
            steps_per_epoch=steps_per_epoch,
        )
    else:
        raise ValueError(f"unknown lr schedule '{lr_cfg.get('name')}'")
    return build_optimizer(
        opt_cfg["name"],
        sched,
        weight_decay=float(opt_cfg.get("weight_decay", 0.0)),
        momentum=float(opt_cfg.get("momentum", 0.9)),
        nesterov=bool(opt_cfg.get("nesterov", False)),
    )
