"""Eval wrappers: full-finetune classification head and multi-tap frozen
linear probes.

Capability reference: utils/eval_utils.py:193-242,298-329.
  * ClassificationWrapper (:193-214): backbone tap -> optional pooling ->
    dropout -> Linear. Finetunes end-to-end on UCF/HMDB; warmup phase
    trains the classifier only (eval-action-recg.py:74-84).
  * Classifier (:217-242): frozen feature -> [dropout] -> [l2norm] ->
    pooling -> BN1d -> Linear (the probe head).
  * MOSTModel (:298-329): frozen extractor (stop_gradient; eval-mode BN)
    emitting multiple taps, one Classifier per tap.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from avid_cma_tpu.criterions.avid import l2_normalize
from avid_cma_tpu.models.blocks import batch_norm
from avid_cma_tpu.ops.pooling import apply_pooling_op


class ClassificationWrapper(nn.Module):
    """reference: utils/eval_utils.py:193-214."""

    feature_extractor: nn.Module
    n_classes: int
    feat_name: str = "pool"
    pooling_op: Optional[str] = None
    use_dropout: bool = False
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        embs = self.feature_extractor(x, train=train, return_embs=True)
        emb = embs[self.feat_name]
        emb = apply_pooling_op(emb, self.pooling_op)
        emb = emb.reshape(x.shape[0], -1)
        if self.use_dropout:
            emb = nn.Dropout(self.dropout, deterministic=not train)(emb)
        return nn.Dense(self.n_classes, name="classifier")(emb)


class Classifier(nn.Module):
    """Per-tap probe head (reference: utils/eval_utils.py:217-242).
    The feature is stop_gradient'ed: only BN+Linear train."""

    n_classes: int
    pooling: Optional[str] = None
    l2_norm: bool = False
    use_bn: bool = True
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = jax.lax.stop_gradient(x)
        if self.use_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        if self.l2_norm:
            x = l2_normalize(x)
        if x.ndim > 2:
            x = apply_pooling_op(x, self.pooling)
        x = x.reshape(x.shape[0], -1)
        if self.use_bn:
            x = batch_norm(train, name="bn")(x)
        return nn.Dense(self.n_classes, name="classifier")(x)


class MOSTModel(nn.Module):
    """Multi-Output-Single-Tap probes over a frozen extractor
    (reference: utils/eval_utils.py:298-329). The extractor always runs
    in eval mode (BN running stats) and under stop_gradient.

    Deliberate divergence: the reference constructs the extractor in eval
    mode (eval_utils.py:312,319-320) but run_phase's model.train(True)
    (eval-action-recg-linear.py:112) recursively flips its BN layers back
    to batch-stat mode — the "frozen" features then depend on the probe
    batch composition. Here train=False is pinned so frozen features are
    deterministic. tests/test_supervised_trajectory_parity.py pins the
    trajectory against the reference modules run with an eval-mode
    extractor (the reference's construction-time intent)."""

    feature_extractor: nn.Module
    n_classes: int
    feat_names: Sequence[str]
    pooling_ops: Sequence[Optional[str]]
    l2_norm: Any = None  # None | bool | list[bool]
    use_bn: bool = False
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        l2 = self.l2_norm
        if l2 is None:
            l2 = [False] * len(self.feat_names)
        elif not isinstance(l2, (list, tuple)):
            l2 = [bool(l2)] * len(self.feat_names)

        embs = self.feature_extractor(x, train=False, return_embs=True)
        embs = jax.lax.stop_gradient({ft: embs[ft] for ft in self.feat_names})
        out = {}
        for i, ft in enumerate(self.feat_names):
            out[ft] = Classifier(
                n_classes=self.n_classes,
                pooling=self.pooling_ops[i],
                l2_norm=l2[i],
                use_bn=self.use_bn,
                use_dropout=self.use_dropout,
                name=f"classifier_{ft}",
            )(embs[ft], train=train)
        return out


def classifier_param_filter(path: tuple, _) -> bool:
    """Trainable-param predicate for the warmup phase: classifier heads
    only (reference filters 'feature_extractor' out,
    eval-action-recg.py:77)."""
    return not any("feature_extractor" in str(p) for p in path)
