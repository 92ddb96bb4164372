"""AVID criterion: cross/within-modal NCE against dual memory banks.

Capability reference: criterions/avid.py:20-236.
  * dual banks view1_mem (video) / view2_mem (audio), randn-init, L2-normed,
    identical across replicas (avid.py:88-101)
  * temperature 0.07 (avid.py:32)
  * per-head scores: query emb vs own-instance bank row (positive) and K
    uniformly drawn bank rows with self-avoid shift (negatives) (avid.py:47-86)
  * EMA bank update from the *globally all-gathered* batch embeddings,
    then renorm (avid.py:103-129)
  * loss = xModal_coeff * (v2a + a2v)/2 + wModal_coeff * (v2v + a2a)/2,
    coefficients normalized to sum 1 (avid.py:216-233)

TPU-first redesign: the bank is explicit train state; the whole criterion
is a pure function `(state, embeddings, indices, rng) -> (loss, logs, state')`
that lives inside the single jitted train step. Under SPMD (shard_map over
the `data` mesh axis) the bank update consumes `all_gather`ed embeddings so
every replica applies the identical transition — banks stay replica-wise
equal without broadcasts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from avid_cma_tpu.criterions.nce import nce_loss, resolve_partition
from avid_cma_tpu.ops.sampling import draw_negatives_uniform

TEMPERATURE = 0.07  # reference: criterions/avid.py:32


class BankState(struct.PyTreeNode):
    """Memory-bank state carried in the train state.

    view1_mem: (N, D) video bank; view2_mem: (N, D) audio bank;
    z: frozen NCE partition function (scalar, -1 = not yet estimated).
    """

    view1_mem: jnp.ndarray
    view2_mem: jnp.ndarray
    z: jnp.ndarray

    @property
    def memory_size(self) -> int:
        return self.view1_mem.shape[0]


@dataclasses.dataclass(frozen=True)
class AVIDConfig:
    num_data: int
    embedding_dim: int = 128
    num_negatives: int = 1024
    momentum: Tuple[float, float] = (0.5, 0.5)
    xModal_coeff: float = 1.0
    wModal_coeff: float = 0.0
    temperature: float = TEMPERATURE

    def __post_init__(self):
        if not isinstance(self.momentum, (tuple, list)):
            object.__setattr__(self, "momentum", (self.momentum, self.momentum))
        else:
            object.__setattr__(self, "momentum", tuple(self.momentum))

    @property
    def coeffs(self) -> Tuple[float, float]:
        s = self.xModal_coeff + self.wModal_coeff
        return self.xModal_coeff / s, self.wModal_coeff / s

    @classmethod
    def from_config(cls, args: dict, embedding_dim: int = 128) -> "AVIDConfig":
        """YAML loss.args -> config (registry entry point used by
        train/builders.build_criterion_config; reference schema:
        configs/main/avid/*/*.yaml loss.args)."""
        return cls(embedding_dim=embedding_dim, **args)


def init_bank_state(
    key: jax.Array, num_data: int, embedding_dim: int, dtype=jnp.float32
) -> BankState:
    """randn banks, L2-normalized (reference: criterions/avid.py:88-101).
    Deterministic in `key`, so identical on every replica by construction
    (the reference needs a broadcast; SPMD does not)."""
    k1, k2 = jax.random.split(key)
    v1 = jax.random.normal(k1, (num_data, embedding_dim), dtype)
    v2 = jax.random.normal(k2, (num_data, embedding_dim), dtype)
    v1 = v1 / jnp.linalg.norm(v1, axis=1, keepdims=True)
    v2 = v2 / jnp.linalg.norm(v2, axis=1, keepdims=True)
    return BankState(view1_mem=v1, view2_mem=v2, z=jnp.float32(-1.0))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _scores(
    query: jnp.ndarray,
    pos_rows: jnp.ndarray,
    neg_rows: jnp.ndarray,
    temperature: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scores of a (bs, D) query against (bs, P, D) positives and
    (bs, K, D) negatives (reference bmm: criterions/avid.py:65-66)."""
    pos = jnp.einsum("bd,bpd->bp", query, pos_rows) / temperature
    neg = jnp.einsum("bd,bkd->bk", query, neg_rows) / temperature
    return pos, neg


def update_banks(
    state: BankState,
    video_emb: jnp.ndarray,
    audio_emb: jnp.ndarray,
    y: jnp.ndarray,
    momentum: Tuple[float, float],
    axis_name: Optional[str] = None,
    bank_sharded: bool = False,
) -> BankState:
    """EMA + renorm bank update from globally gathered embeddings
    (reference: criterions/avid.py:103-129). Duplicate indices within the
    gathered batch resolve by last-write-wins, like torch index_copy_.

    With `bank_sharded`, view*_mem are row-shards and each replica
    scatters only the rows it owns (parallel/sharding.py)."""
    if axis_name is not None:
        video_emb = jax.lax.all_gather(video_emb, axis_name, tiled=True)
        audio_emb = jax.lax.all_gather(audio_emb, axis_name, tiled=True)
        y = jax.lax.all_gather(y, axis_name, tiled=True)
    video_emb = jax.lax.stop_gradient(video_emb)
    audio_emb = jax.lax.stop_gradient(audio_emb)

    if bank_sharded:
        from avid_cma_tpu.parallel.sharding import ema_update_rows_sharded

        assert axis_name is not None, "sharded banks require a mesh axis"
        return state.replace(
            view1_mem=ema_update_rows_sharded(
                state.view1_mem, y, video_emb, momentum[0], axis_name
            ),
            view2_mem=ema_update_rows_sharded(
                state.view2_mem, y, audio_emb, momentum[1], axis_name
            ),
        )

    def ema(mem, emb, mom):
        old = mem[y]
        new = l2_normalize(old * mom + emb * (1.0 - mom))
        return mem.at[y].set(new, mode="drop", unique_indices=False)

    return state.replace(
        view1_mem=ema(state.view1_mem, video_emb, momentum[0]),
        view2_mem=ema(state.view2_mem, audio_emb, momentum[1]),
    )


def avid_forward(
    state: BankState,
    video_emb: jnp.ndarray,
    audio_emb: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    cfg: AVIDConfig,
    axis_name: Optional[str] = None,
    bank_sharded: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], BankState]:
    """One criterion step (reference: criterions/avid.py:47-80,202-233).

    Returns (total_loss, tb_log, new_state). Differentiable in the
    embeddings; the bank and Z are constants within the step. With
    `bank_sharded`, view*_mem are row-shards over `axis_name` and every
    bank access goes through one-psum sharded gathers.
    """
    xmodal, wmodal = cfg.xModal_coeff > 0, cfg.wModal_coeff > 0
    # loss math is ALWAYS f32: bf16 embeddings quantize unit-vector
    # cosines to ~0.004 steps — coarser than the spread separating hard
    # instances, enough to collapse instance discrimination outright
    # (see models/av_wrapper.py Head; the head already emits f32, this
    # cast is the safety net for custom models that don't)
    video_emb = l2_normalize(video_emb.astype(jnp.float32))
    audio_emb = l2_normalize(audio_emb.astype(jnp.float32))

    bank_v = jax.lax.stop_gradient(state.view1_mem)
    bank_a = jax.lax.stop_gradient(state.view2_mem)

    neg_idx = draw_negatives_uniform(key, y, cfg.num_negatives, cfg.num_data)
    if bank_sharded:
        # idx/query are PER-REPLICA (each replica's own batch shard), so
        # bank accesses must go through the sharded-score psum — a plain
        # psum-of-masked-gathers would mix the replicas' requests.
        from avid_cma_tpu.parallel.sharding import scores_sharded

        assert axis_name is not None, "sharded banks require a mesh axis"

        def sc(query, bank, idx):
            return scores_sharded(bank, idx, query, axis_name) / cfg.temperature
    else:
        # gather_scores = XLA gather+einsum by default (identical math to
        # _scores), or the fused Pallas gather kernel with
        # AVID_NCE_SCORES=pallas (see ops/pallas/nce_gather.py)
        from avid_cma_tpu.ops.pallas.nce_gather import gather_scores

        def sc(query, bank, idx):
            return gather_scores(bank, idx, query, cfg.temperature)

    y1 = y[:, None]  # (bs, 1)
    scores: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    if xmodal:
        scores["v2a"] = (sc(video_emb, bank_a, y1), sc(video_emb, bank_a, neg_idx))
        scores["a2v"] = (sc(audio_emb, bank_v, y1), sc(audio_emb, bank_v, neg_idx))
    if wmodal:
        scores["v2v"] = (sc(video_emb, bank_v, y1), sc(video_emb, bank_v, neg_idx))
        scores["a2a"] = (sc(audio_emb, bank_a, y1), sc(audio_emb, bank_a, neg_idx))

    # Z freezes from the first head's negatives on the first step, in the
    # reference's head-insertion order (shared NCECriterion instance,
    # criterions/nce.py:21-24 + avid.py:68-76).
    first_head = "v2a" if xmodal else "v2v"
    z = resolve_partition(
        state.z, jnp.exp(scores[first_head][1]), axis_name=axis_name
    )

    tb_log: Dict[str, jnp.ndarray] = {}
    xmodal_loss = jnp.float32(0.0)
    wmodal_loss = jnp.float32(0.0)
    for head, (s_pos, s_neg) in scores.items():
        loss = nce_loss(s_pos, s_neg, z)
        if head in ("v2a", "a2v"):
            xmodal_loss = xmodal_loss + loss / 2.0
        else:
            wmodal_loss = wmodal_loss + loss / 2.0
        tb_log[f"Loss/{head}"] = loss
    tb_log["Loss/xModal"] = xmodal_loss
    tb_log["Loss/wModal"] = wmodal_loss

    xc, wc = cfg.coeffs
    total = xmodal_loss * xc + wmodal_loss * wc

    new_state = update_banks(
        state.replace(z=z), video_emb, audio_emb, y, cfg.momentum, axis_name,
        bank_sharded=bank_sharded,
    )
    return total, tb_log, new_state
