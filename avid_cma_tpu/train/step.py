"""The single jitted SPMD train step.

Capability reference: the per-batch hot loop main-avid.py:155-192
(forward -> criterion -> backward -> optimizer -> meters) plus the DDP
gradient all-reduce and the criterion's internal all_gather.

TPU-first redesign: ONE `jax.jit`(shard_map) program per step fusing
  model fwd -> NCE scoring vs bank -> loss -> grads (psum) ->
  optimizer update -> bank EMA transition -> BN-stat sync
with the train state donated, so banks/params update in-place in HBM.
BatchNorm uses the *local* shard statistics for normalization (DDP parity:
the reference never syncs BN) while running stats are pmean'd so the
carried state stays replica-identical.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from avid_cma_tpu.criterions.avid import AVIDConfig, avid_forward, init_bank_state
from avid_cma_tpu.criterions.avid_cma import (
    AVIDCMAConfig,
    cma_forward,
    cma_state_from_bank,
)
from avid_cma_tpu.parallel.mesh import DATA_AXIS
from avid_cma_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]  # frames (B,T,H,W,C), audio (B,T,F,1), index (B,)
CriterionConfig = Union[AVIDConfig, AVIDCMAConfig]


def criterion_fn(cfg: CriterionConfig) -> Callable:
    if isinstance(cfg, AVIDCMAConfig):
        return cma_forward
    if isinstance(cfg, AVIDConfig):
        return avid_forward
    raise TypeError(f"unknown criterion config {type(cfg)}")


def init_train_state(
    key: jax.Array,
    model,
    sample_batch: Batch,
    optimizer: optax.GradientTransformation,
    criterion_cfg: Optional[CriterionConfig] = None,
    bank=None,
) -> TrainState:
    k_model, k_bank, k_rng = jax.random.split(key, 3)
    variables = model.init(
        k_model, sample_batch["frames"], sample_batch["audio"], train=False
    )
    if bank is None and criterion_cfg is not None:
        bank = init_bank_state(
            k_bank, criterion_cfg.num_data, criterion_cfg.embedding_dim
        )
        if isinstance(criterion_cfg, AVIDCMAConfig):
            # cma_forward reads state.positive_set; a plain BankState
            # would crash at trace time. Zeroed set — callers mine it.
            bank = cma_state_from_bank(
                bank,
                jnp.zeros(
                    (criterion_cfg.num_data, criterion_cfg.pos_k), jnp.int32
                ),
            )
    params = variables["params"]
    return TrainState(
        step=jnp.int32(0),
        epoch=jnp.int32(0),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        bank=bank,
        rng=k_rng,
    )


def _bank_sharded(bank_sharding: str) -> bool:
    """Validate the config string — a typo silently running replicated
    banks would surface as an HBM OOM at AudioSet scale, not an error."""
    if bank_sharding not in ("replicated", "sharded"):
        raise ValueError(
            f"unknown bank_sharding {bank_sharding!r} (replicated|sharded)"
        )
    return bank_sharding == "sharded"


def bank_state_specs(state: TrainState, axis: str, bank_sharded: bool):
    """Per-leaf PartitionSpecs for a TrainState: everything replicated
    except (optionally) the bank rows (view*_mem, positive_set)."""
    sharded_leaves = {"view1_mem", "view2_mem", "positive_set"}

    def spec(path, leaf):
        names = [getattr(p, "name", getattr(p, "key", "")) for p in path]
        if bank_sharded and "bank" in names and names[-1] in sharded_leaves:
            return P(axis) if jnp.ndim(leaf) == 1 else P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, state)


def make_train_step(
    model,
    criterion_cfg: CriterionConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    donate: bool = True,
    bank_sharding: str = "replicated",  # replicated | sharded
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step for a data-sharded batch on `mesh`.

    bank_sharding='sharded' keeps the memory banks row-sharded over the
    mesh (for corpora whose banks exceed one chip's HBM, SURVEY §2.3);
    bank rows must be pre-padded to a multiple of the mesh size
    (parallel/sharding.shard_bank)."""
    criterion = criterion_fn(criterion_cfg)
    bank_sharded = _bank_sharded(bank_sharding)

    def local_step(state: TrainState, video, audio, y):
        # per-replica negative draws, like per-process torch RNG
        key = jax.random.fold_in(state.next_rng(), jax.lax.axis_index(axis))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (v_emb, a_emb), mut = model.apply(
                variables, video, audio, train=True, mutable=["batch_stats"]
            )
            loss, tb, new_bank = criterion(
                state.bank, v_emb, a_emb, y, key, criterion_cfg,
                axis_name=axis, bank_sharded=bank_sharded,
            )
            return loss, (tb, new_bank, mut["batch_stats"])

        (loss, (tb, new_bank, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean({**tb, "loss": loss}, axis)
        new_stats = jax.lax.pmean(new_stats, axis)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            bank=new_bank,
        )
        return new_state, metrics

    def step_fn(state: TrainState, batch: Batch):
        specs = bank_state_specs(state, axis, bank_sharded)
        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(specs, P(axis), P(axis), P(axis)),
            out_specs=(specs, P()),
            check_vma=False,  # bank update provably replicated/owned-rows
        )
        return sharded(state, batch["frames"], batch["audio"], batch["index"])

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_fused_train_step(
    model,
    criterion_cfg: CriterionConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    pp_cfg,
    seed: int,
    axis: str = DATA_AXIS,
    bank_sharding: str = "replicated",
):
    """Train step with device preprocessing traced INTO the step program:
    one dispatch per batch (augmentation/spectrogram fuse with the model
    program) and the train state donated at the top-level jit so
    params/opt-state/banks update in place in HBM (an inner jit's
    donate_argnums does not survive inlining).

    Call as `fused(state, raw_batch, step_i)` with the loader's raw
    {frames: uint8, audio: f32, index} batch; step_i (host-side step
    counter) derives the per-batch augmentation key, and is a traced
    scalar — no recompilation per step."""
    from avid_cma_tpu.data.pipelines import preprocess_batch

    inner = make_train_step(
        model, criterion_cfg, optimizer, mesh,
        axis=axis, donate=False, bank_sharding=bank_sharding,
    )
    base_key = jax.random.key(seed + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused(state: TrainState, raw_batch: Batch, step_i):
        key = jax.random.fold_in(base_key, step_i)
        batch = preprocess_batch(key, raw_batch, pp_cfg, train=True)
        return inner(state, batch)

    return fused


def make_eval_loss_step(
    model,
    criterion_cfg: CriterionConfig,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    bank_sharding: str = "replicated",
) -> Callable[[TrainState, Batch], Dict[str, jnp.ndarray]]:
    """Criterion loss on a held-out batch WITHOUT updating params or banks
    (pretrain test phase, main-avid.py run_phase 'test'). Deliberate
    divergence: the reference's criterion forward mutates the banks even
    in test phases (criterions/avid.py:78) — evaluating on val data would
    corrupt the train banks, so we drop the update here."""
    criterion = criterion_fn(criterion_cfg)
    bank_sharded = _bank_sharded(bank_sharding)

    def local(state: TrainState, video, audio, y, batch_idx):
        # fold a per-batch counter: state never changes during a test
        # phase, so without it every val batch would draw the same
        # negatives
        key = jax.random.fold_in(
            jax.random.fold_in(state.rng, 1_000_003 + batch_idx[0]),
            jax.lax.axis_index(axis),
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        v_emb, a_emb = model.apply(variables, video, audio, train=False)
        loss, tb, _ = criterion(
            state.bank, v_emb, a_emb, y, key, criterion_cfg,
            axis_name=axis, bank_sharded=bank_sharded,
        )
        return jax.lax.pmean({**tb, "loss": loss}, axis)

    def step_fn(state: TrainState, batch: Batch, batch_idx: int = 0):
        specs = bank_state_specs(state, axis, bank_sharded)
        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(specs, P(axis), P(axis), P(axis), P()), out_specs=P(),
            check_vma=False,
        )
        return sharded(
            state, batch["frames"], batch["audio"], batch["index"],
            jnp.asarray([batch_idx], jnp.int32),
        )

    return jax.jit(step_fn)


def make_fused_eval_step(
    model,
    criterion_cfg: CriterionConfig,
    mesh: Mesh,
    pp_cfg,
    seed: int,
    axis: str = DATA_AXIS,
    bank_sharding: str = "replicated",
):
    """Eval-loss step with device preprocessing traced INTO the program
    (mirror of make_fused_train_step): one dispatch per held-out batch.
    Consumes the loader's raw batch — under multi-process execution the
    caller passes global arrays (parallel/multihost.global_batch); eager
    host-side preprocessing of those would be illegal, which is why the
    preprocessing must live inside the jit here."""
    from avid_cma_tpu.data.pipelines import preprocess_batch

    inner = make_eval_loss_step(
        model, criterion_cfg, mesh, axis=axis, bank_sharding=bank_sharding
    )
    base_key = jax.random.key(seed + 3)

    @jax.jit
    def fused(state: TrainState, raw_batch: Batch, batch_idx):
        key = jax.random.fold_in(base_key, batch_idx)
        batch = preprocess_batch(key, raw_batch, pp_cfg, train=False)
        return inner(state, batch, batch_idx)

    return fused


def make_embed_fn(model, mesh: Mesh, axis: str = DATA_AXIS) -> Callable:
    """Jitted inference embeddings (no state mutation), data-sharded."""

    def local(params, batch_stats, video, audio):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, video, audio, train=False)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    return jax.jit(sharded)
