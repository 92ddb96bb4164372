"""AVID-CMA criterion: instance discrimination + positive-set expansion.

Capability reference: criterions/avid_cma.py:126-364.
  * positive_set (N, pos_k) mined from the banks by agreement top-k
    (mining.py here; CMASampler in the reference), re-mined every
    `resample_freq` epochs (avid_cma.py:361-364)
  * per-step heads (avid_cma.py:150-194):
      inst-v2a / inst-a2v : self bank row positive vs K negatives
      pos-v2v / pos-a2a   : pos_k mined positives vs first
                            num_negatives_within negatives
      (pos-v2a / pos-a2v when xModalPos)
  * negatives drawn uniformly excluding the sorted positive list via
    rank-shift (avid_cma.py:196-209) — NOTE the reference excludes only
    the mined positives, not the self index; we match that.
  * 4-term loss with normalized coefficients (avid_cma.py:338-359)

The reference's wModalInst branch recomputes the cross-modal scores under
the same keys (avid_cma.py:175-177) — dead/incorrect code we do NOT
reproduce; wModalInst here scores within-modal as the name intends.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from avid_cma_tpu.criterions.avid import (
    TEMPERATURE,
    BankState,
    _scores,
    l2_normalize,
    update_banks,
)
from avid_cma_tpu.criterions.nce import nce_loss, resolve_partition
from avid_cma_tpu.ops.sampling import draw_negatives_avoid_sorted


@dataclasses.dataclass(frozen=True)
class AVIDCMAConfig:
    num_data: int
    embedding_dim: int = 128
    num_negatives: int = 1024
    num_negatives_within: Optional[int] = 64
    momentum: Tuple[float, float] = (0.5, 0.5)
    xModalInstCoeff: float = 1.0
    wModalInstCoeff: float = 0.0
    xModalPosCoeff: float = 0.0
    wModalPosCoeff: float = 1.0
    pos_k: int = 32
    sampling_type: str = "consensus"
    mining_exact: bool = True  # False: approx_max_k top-k (mining.py)
    resample_freq: int = -1
    temperature: float = TEMPERATURE

    def __post_init__(self):
        if not isinstance(self.momentum, (tuple, list)):
            object.__setattr__(self, "momentum", (self.momentum, self.momentum))
        else:
            object.__setattr__(self, "momentum", tuple(self.momentum))

    @classmethod
    def from_config(cls, args: dict, embedding_dim: int = 128) -> "AVIDCMAConfig":
        """YAML loss.args -> config (registry entry point; reference
        schema nests the mining knobs under loss.args.sampling_args,
        configs/main/avid-cma/*/*.yaml)."""
        args = dict(args)
        sampling = args.pop("sampling_args", {}) or {}
        return cls(
            embedding_dim=embedding_dim,
            pos_k=sampling.get("pos_k", 32),
            sampling_type=sampling.get("type", "consensus"),
            mining_exact=bool(sampling.get("exact", True)),
            **args,
        )

    @property
    def coeffs(self) -> Tuple[float, float, float, float]:
        s = (
            self.xModalInstCoeff
            + self.wModalInstCoeff
            + self.xModalPosCoeff
            + self.wModalPosCoeff
        )
        return (
            self.xModalInstCoeff / s,
            self.wModalInstCoeff / s,
            self.xModalPosCoeff / s,
            self.wModalPosCoeff / s,
        )


class CMAState(BankState):
    """BankState + the mined positive set (N, pos_k), rows sorted."""

    positive_set: jnp.ndarray = None  # type: ignore[assignment]


def cma_state_from_bank(bank: BankState, positive_set: jnp.ndarray) -> CMAState:
    return CMAState(
        view1_mem=bank.view1_mem,
        view2_mem=bank.view2_mem,
        z=bank.z,
        positive_set=positive_set.astype(jnp.int32),
    )


def should_resample(epoch: int, resample_freq: int) -> bool:
    """reference: criterions/avid_cma.py:361-364."""
    return resample_freq > 0 and epoch > 0 and epoch % resample_freq == 0


def cma_forward(
    state: CMAState,
    video_emb: jnp.ndarray,
    audio_emb: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    cfg: AVIDCMAConfig,
    axis_name: Optional[str] = None,
    bank_sharded: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], CMAState]:
    """One AVID-CMA criterion step (reference: avid_cma.py:150-194,325-359).
    With `bank_sharded`, banks AND positive_set are row-sharded over
    `axis_name` (parallel/sharding.py)."""
    x_inst = cfg.xModalInstCoeff > 0
    w_inst = cfg.wModalInstCoeff > 0
    x_pos = cfg.xModalPosCoeff > 0
    w_pos = cfg.wModalPosCoeff > 0

    video_emb = l2_normalize(video_emb)
    audio_emb = l2_normalize(audio_emb)

    bank_v = jax.lax.stop_gradient(state.view1_mem)
    bank_a = jax.lax.stop_gradient(state.view2_mem)

    T = cfg.temperature
    scores: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    if bank_sharded:
        # y/neg_idx are PER-REPLICA, so every bank access goes through the
        # sharded-score psum (see parallel/sharding.scores_sharded); the
        # small (bs, pos_k) int positive-set rows ride the all_gather-based
        # row gather.
        from avid_cma_tpu.parallel.sharding import (
            gather_values_sharded,
            scores_sharded,
        )

        assert axis_name is not None, "sharded banks require a mesh axis"
        pos_idx = gather_values_sharded(
            state.positive_set, y, axis_name
        ).astype(jnp.int32)
        neg_idx = draw_negatives_avoid_sorted(
            key, pos_idx, cfg.num_negatives, cfg.num_data
        )
        y1 = y[:, None]
        kw = cfg.num_negatives_within
        neg_w = neg_idx[:, :kw] if kw is not None else neg_idx

        def sc(query, bank, idx):
            return scores_sharded(bank, idx, query, axis_name) / T

        if x_inst:
            scores["inst-v2a"] = (sc(video_emb, bank_a, y1), sc(video_emb, bank_a, neg_idx))
            scores["inst-a2v"] = (sc(audio_emb, bank_v, y1), sc(audio_emb, bank_v, neg_idx))
        if w_inst:
            scores["inst-v2v"] = (sc(video_emb, bank_v, y1), sc(video_emb, bank_v, neg_idx))
            scores["inst-a2a"] = (sc(audio_emb, bank_a, y1), sc(audio_emb, bank_a, neg_idx))
        if x_pos:
            scores["pos-v2a"] = (sc(video_emb, bank_a, pos_idx), sc(video_emb, bank_a, neg_idx))
            scores["pos-a2v"] = (sc(audio_emb, bank_v, pos_idx), sc(audio_emb, bank_v, neg_idx))
        if w_pos:
            scores["pos-v2v"] = (sc(video_emb, bank_v, pos_idx), sc(video_emb, bank_v, neg_w))
            scores["pos-a2a"] = (sc(audio_emb, bank_a, pos_idx), sc(audio_emb, bank_a, neg_w))
    else:
        self_v = bank_v[y][:, None, :]
        self_a = bank_a[y][:, None, :]

        pos_idx = state.positive_set[y]  # (bs, pos_k), sorted
        neg_idx = draw_negatives_avoid_sorted(
            key, pos_idx, cfg.num_negatives, cfg.num_data
        )
        pos_v, pos_a = bank_v[pos_idx], bank_a[pos_idx]
        neg_v, neg_a = bank_v[neg_idx], bank_a[neg_idx]

        if x_inst:
            scores["inst-v2a"] = _scores(video_emb, self_a, neg_a, T)
            scores["inst-a2v"] = _scores(audio_emb, self_v, neg_v, T)
        if w_inst:
            scores["inst-v2v"] = _scores(video_emb, self_v, neg_v, T)
            scores["inst-a2a"] = _scores(audio_emb, self_a, neg_a, T)
        if x_pos:
            scores["pos-v2a"] = _scores(video_emb, pos_a, neg_a, T)
            scores["pos-a2v"] = _scores(audio_emb, pos_v, neg_v, T)
        if w_pos:
            kw = cfg.num_negatives_within
            wm_neg_v = neg_v[:, :kw] if kw is not None else neg_v
            wm_neg_a = neg_a[:, :kw] if kw is not None else neg_a
            scores["pos-v2v"] = _scores(video_emb, pos_v, wm_neg_v, T)
            scores["pos-a2a"] = _scores(audio_emb, pos_a, wm_neg_a, T)

    # Z freezes from the first active head's negatives (shared NCECriterion,
    # insertion order inst-x, inst-w, pos-x, pos-w; nce.py:21-24).
    first_head = next(iter(scores))
    z = resolve_partition(state.z, jnp.exp(scores[first_head][1]), axis_name)

    groups = {
        ("inst-v2a", "inst-a2v"): 0,
        ("inst-v2v", "inst-a2a"): 1,
        ("pos-v2a", "pos-a2v"): 2,
        ("pos-v2v", "pos-a2a"): 3,
    }
    losses = [jnp.float32(0.0)] * 4
    tb_log: Dict[str, jnp.ndarray] = {}
    for head, (s_pos, s_neg) in scores.items():
        loss = nce_loss(s_pos, s_neg, z)
        for pair, gi in groups.items():
            if head in pair:
                losses[gi] = losses[gi] + loss / 2.0
        tb_log[f"Loss/{head}"] = loss

    coeffs = cfg.coeffs
    total = sum(l * c for l, c in zip(losses, coeffs))
    for name, l in zip(("xModalInst", "wModalInst", "xModalPos", "wModalPos"), losses):
        tb_log[f"Loss/{name}"] = l

    new_state = update_banks(
        state.replace(z=z), video_emb, audio_emb, y, cfg.momentum, axis_name,
        bank_sharded=bank_sharded,
    )
    return total, tb_log, new_state
