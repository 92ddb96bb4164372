"""Pretraining orchestration: the epoch/step loop.

Capability reference: main-avid.py:84-201 (main_worker + run_phase):
build everything, restore, loop epochs calling the per-batch hot path,
checkpoint per epoch (+milestone copies), meters + TensorBoard.

TPU-first: the hot path is ONE jitted SPMD program (train/step.py); the
host loop only feeds raw batches and drains metrics. Checkpoints are
orbax (preemption-safe, every epoch AND every `save_freq_steps`), with
optional .pth.tar export for reference interop.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from avid_cma_tpu.config import Config
from avid_cma_tpu.criterions import (
    AVIDCMAConfig,
    cma_state_from_bank,
    init_bank_state,
    mine_positives,
    mine_positives_sharded,
    should_resample,
)
from avid_cma_tpu.criterions.avid import BankState
from avid_cma_tpu.data.pipelines import preprocess_batch
from avid_cma_tpu.data.prefetch import device_prefetch
from avid_cma_tpu.parallel.mesh import DATA_AXIS, make_mesh
from avid_cma_tpu.parallel.multihost import (
    distribute_tree,
    is_multiprocess,
)
from avid_cma_tpu.train import builders
from avid_cma_tpu.train.checkpoint import (
    CheckpointManager,
    import_criterion_orbax,
    import_criterion_pth_tar,
    import_model_orbax,
    import_model_pth_tar,
)
from avid_cma_tpu.train.optim import build_from_config
from avid_cma_tpu.train.state import TrainState
from avid_cma_tpu.train.step import (
    bank_state_specs,
    init_train_state,
    make_fused_eval_step,
    make_fused_train_step,
)
from avid_cma_tpu.utils import profiling
from avid_cma_tpu.utils.logger import (
    AverageMeter,
    Logger,
    ProgressMeter,
    TensorBoardWriter,
    parameter_description,
)


def run_pretraining(cfg: Config, debug: bool = False) -> TrainState:
    """`python main_avid.py <cfg.yaml>` body (reference: main-avid.py)."""
    seed = int(cfg.get("seed", 0))
    mesh = make_mesh()
    n_dev = mesh.size

    model_dir = os.path.join(cfg.model["model_dir"], cfg.model["name"])
    logger = Logger(path=os.path.join(model_dir, "train.log"),
                    quiet=bool(cfg.get("quiet")),
                    rank=jax.process_index())
    tb = TensorBoardWriter(
        os.path.join(model_dir, "tb"),
        # rank-0 only: N processes appending the same scalar stream to a
        # shared model_dir would duplicate every point
        enabled=bool(cfg.get("log2tb", False)) and jax.process_index() == 0,
    )
    logger.add_line(f"devices={n_dev} mesh={mesh.shape} seed={seed}")
    logger.log_config(cfg)
    if jax.process_index() == 0:  # resolved config: read back by
        import yaml               # scripts/checkpoints.py export

        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(model_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg.to_dict(), f)

    db_cfg = cfg.dataset
    if debug:
        db_cfg = Config(dict(db_cfg))
        db_cfg["batch_size"] = max(n_dev * 2, 4)

    # --- data -------------------------------------------------------------
    train_ds = builders.build_dataset(db_cfg, db_cfg.train, mode="clip")
    num_workers = 1 if debug else int(cfg.get("num_workers", 4))
    loader_kind = str(cfg.get("loader", "threaded"))
    loader = builders.build_dataloader(
        train_ds, db_cfg, db_cfg.train, num_workers=num_workers,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        seed=seed, kind=loader_kind,
    )
    test_loader = None
    if not cfg.get("no_test", False) and "test" in db_cfg:
        try:
            test_ds = builders.build_dataset(db_cfg, db_cfg.test, mode="clip")
            test_loader = builders.build_dataloader(
                test_ds, db_cfg, db_cfg.test, num_workers=num_workers,
                num_shards=jax.process_count(),
                shard_index=jax.process_index(), seed=seed, kind=loader_kind,
            )
        except (FileNotFoundError, ValueError) as e:
            # missing split files OR a split too small for one batch —
            # the test phase is optional either way
            logger.add_line(f"no usable test split ({e}); skipping test phases")
    pp_cfg = builders.build_preprocess_config(db_cfg)
    logger.add_line(f"train dataset: {train_ds.name} n={train_ds.num_samples} "
                    f"batches/epoch={len(loader)}")

    # --- model / criterion / optimizer -----------------------------------
    model = build_model_with_warmstart(cfg.model, logger)
    crit_cfg = builders.build_criterion_config(
        cfg.loss, embedding_dim=builders.model_out_dim(cfg.model)
    )
    if crit_cfg.num_data != train_ds.num_samples:
        logger.add_line(
            f"note: loss.num_data={crit_cfg.num_data} != dataset size "
            f"{train_ds.num_samples}; using dataset size"
        )
        import dataclasses

        crit_cfg = dataclasses.replace(crit_cfg, num_data=train_ds.num_samples)

    steps_per_epoch = max(len(loader), 1)
    optimizer = build_from_config(cfg.optimizer, steps_per_epoch)
    epochs = int(cfg.optimizer["num_epochs"]) if not debug else 2
    pw = cfg.get("profile_steps")  # [start, stop) global-step trace window
    profile_window = None
    if pw:
        pw = [int(x) for x in pw]
        if len(pw) != 2 or pw[1] <= pw[0]:
            raise ValueError(
                f"profile_steps must be [start, stop) with stop > start; "
                f"got {pw}"
            )
        profile_window = tuple(pw)
    profiling_active = False
    milestones = set(cfg.optimizer["lr"].get("milestones", []))

    # --- state init / restore ---------------------------------------------
    # shape probe: model.init only needs array shapes — decode ONE item
    # and tile it rather than paying a full batch of video decode (and a
    # worker-pool spin-up) before training starts
    item = train_ds[0]
    bs_local = max(
        int(db_cfg["batch_size"]) // max(jax.process_count(), 1), 1
    )
    sample = {
        k: np.repeat(np.asarray(v)[None], bs_local, axis=0)
        for k, v in item.items()
    }
    sample = preprocess_batch(jax.random.key(0), sample, pp_cfg, train=True)
    state = init_train_state(jax.random.key(seed), model, sample, optimizer)
    logger.add_line(parameter_description(state.params))
    ckpt = CheckpointManager(os.path.join(model_dir, "orbax"))
    resuming = bool(cfg.get("resume")) and ckpt.latest_step() is not None
    # backbone warm-start from a reference/exported .pth.tar (the AVID-CMA
    # configs point model.args.checkpoint at the AVID pretrain checkpoint);
    # skipped when resuming — the orbax restore overwrites it anyway
    model_ck = cfg.model.get("args", {}).get("checkpoint")
    if (not resuming and model_ck
            and (os.path.isfile(model_ck) or os.path.isdir(model_ck))):
        # .pth.tar (reference interop) or a model_dir/orbax directory
        # from a pretrain run done in this framework (torch-free chain)
        if os.path.isdir(model_ck):
            variables = import_model_orbax(model_ck)
        else:
            variables = import_model_pth_tar(model_ck)
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
        )
        logger.add_line(f"warm-started model from {model_ck}")
    # bank layout: 'sharded' keeps bank rows (and the CMA positive set)
    # row-sharded over the mesh — required once banks outgrow one chip's
    # HBM (AudioSet-2M: 2x1.78Mx128; reference replicates per GPU,
    # criterions/avid.py:88-101)
    bank_sharding = str(cfg.loss.get("bank_sharding", "replicated"))
    bank_sharded = bank_sharding == "sharded"
    # when resuming, the O(N^2 D) CMA mining sweep would be thrown away by
    # the restore — only the bank pytree SHAPE (and sharding) is needed as
    # a template
    state = state.replace(
        bank=_init_bank(cfg.loss, crit_cfg,
                        mesh.size if bank_sharded else 1, seed, logger,
                        template_only=resuming)
    )
    # host-built, process-identical state -> global arrays over the mesh
    # (the multi-host bridge; single-process this is plain placement)
    state = distribute_tree(
        state, mesh, bank_state_specs(state, DATA_AXIS, bank_sharded)
    )
    if resuming:
        state = ckpt.restore(state)
        logger.add_line(f"resumed from step {int(state.step)}")
    elif isinstance(crit_cfg, AVIDCMAConfig):
        # positive set mined AFTER distribution so the sweep runs on
        # global arrays (mesh-sharded queries; multi-process-legal)
        logger.add_line(
            f"mining CMA positives: N={crit_cfg.num_data} "
            f"pos_k={crit_cfg.pos_k} type={crit_cfg.sampling_type}"
        )
        state = state.replace(bank=state.bank.replace(
            positive_set=_mine(state.bank, crit_cfg, mesh, bank_sharded)
        ))

    # preprocessing traced into the step program (one dispatch/batch),
    # state donated at the top-level jit (in-place HBM updates)
    train_step = make_fused_train_step(
        model, crit_cfg, optimizer, mesh, pp_cfg, seed,
        bank_sharding=bank_sharding,
    )
    eval_step = None

    # --- epoch loop --------------------------------------------------------
    start_epoch = int(state.epoch)
    print_freq = int(cfg.get("print_freq", 100))
    for epoch in range(start_epoch, epochs):
        if isinstance(crit_cfg, AVIDCMAConfig) and should_resample(
            epoch, crit_cfg.resample_freq
        ):
            logger.add_line(f"epoch {epoch}: re-mining CMA positive set")
            state = state.replace(bank=state.bank.replace(
                positive_set=_mine(state.bank, crit_cfg, mesh, bank_sharded)
            ))

        loader.set_epoch(epoch)
        state = state.with_epoch(epoch)
        meters = {
            "loss": AverageMeter("Loss", ":.4e"),
            "batch_t": AverageMeter("Time", ":.3f", window_size=100),
            "data_t": AverageMeter("Data", ":.3f", window_size=100),
        }
        progress = ProgressMeter(
            len(loader), meters.values(), phase="pretrain", epoch=epoch,
            logger=logger,
        )

        save_freq_steps = int(cfg.get("save_freq_steps", 0))
        # host-side mirror of state.step: reading int(state.step) would
        # force a device sync every iteration, serializing host batch prep
        # against device compute. Per-batch losses are buffered as device
        # arrays and drained in bulk at print points so the epoch average
        # covers EVERY batch (reference meters update per batch,
        # main-avid.py:183-192) without a per-step sync.
        host_step = int(state.step)
        pending_losses = []

        # mid-epoch resume: the restored step may sit inside this epoch —
        # fast-forward past the already-trained batches (the deterministic
        # sampler reproduces the same order for a given epoch) instead of
        # double-training them and drifting the step count vs the LR
        # schedule. Not in debug mode: debug shrinks the batch size, so
        # steps_per_epoch no longer matches the run being resumed.
        skip_batches = 0
        start_it = 0
        if not debug and epoch == start_epoch:
            skip_batches = min(
                max(host_step - epoch * steps_per_epoch, 0), len(loader)
            )
            if skip_batches:
                logger.add_line(
                    f"mid-epoch resume: skipping {skip_batches} "
                    f"already-trained batches of epoch {epoch}"
                )
            if skip_batches and hasattr(loader, "set_start_batch"):
                # index-level skip: no decode is paid for skipped batches
                # (discarding yielded batches would decode them all —
                # hours at AudioSet scale)
                loader.set_start_batch(skip_batches)
                start_it, skip_batches = skip_batches, 0

        def drain_losses():
            # ONE device round-trip for the whole pending window: a
            # per-array float() fetch serializes a D2H RPC per batch
            # (~40 ms each through a tunneled runtime — measured as a
            # 43 ms/batch, 41% loop overhead by scripts/
            # prod_loop_timing.py before this fix; micro-D2H latency
            # hiding matters on local PCIe hosts too). Stacking is one
            # tiny async dispatch; the copy fetches one (k,) array.
            if not pending_losses:
                return
            vals = np.asarray(jnp.stack([a for a, _ in pending_losses]))
            for v, (_, n) in zip(vals, pending_losses):
                meters["loss"].update(float(v), n=n)
            pending_losses.clear()

        # discard fallback for loaders without set_start_batch: skip on
        # the RAW host iterator (decode is still paid — the documented
        # cost of this path — but no H2D placement / global-array
        # assembly for batches that are about to be thrown away)
        batch_iter = iter(loader)
        if skip_batches:
            for _ in range(skip_batches):
                next(batch_iter, None)
            start_it, skip_batches = start_it + skip_batches, 0

        t0 = time.time()
        # device_prefetch: batches arrive already row-sharded on the mesh,
        # their H2D DMA overlapped with the previous step's compute
        # (reference: pinned-memory .cuda(non_blocking), main-avid.py:161)
        for it, batch in enumerate(device_prefetch(batch_iter, mesh),
                                   start=start_it):
            meters["data_t"].update(time.time() - t0)
            # profile_steps: [start, stop) global-step window captured as
            # an XLA trace into model_dir/profile (open with
            # TensorBoard's profile plugin; superset of the reference's
            # wall-clock meters, SURVEY §5 'Tracing/profiling: none').
            # Range conditions, not equality: a resume may land inside
            # the window (start late) or past it (never start).
            if (profile_window and not profiling_active
                    and profile_window[0] <= host_step < profile_window[1]):
                profiling.start_trace(os.path.join(model_dir, "profile"))
                profiling_active = True
                logger.add_line(f"profiler: tracing steps {profile_window}")
            state, metrics = train_step(state, batch, host_step)
            pending_losses.append((metrics["loss"], batch["index"].shape[0]))
            host_step += 1
            if profiling_active and host_step >= profile_window[1]:
                jax.block_until_ready(metrics["loss"])
                profiling.stop_trace()
                profiling_active = False
                logger.add_line(
                    f"profiler: trace written to {model_dir}/profile"
                )
            # preemption-safe mid-epoch checkpointing (TPU preemption is
            # routine; the reference only saves per epoch, SURVEY §5)
            if save_freq_steps and host_step % save_freq_steps == 0:
                ckpt.save(host_step, state)
            if it % print_freq == 0 or it == len(loader) - 1:
                drain_losses()  # sync point
                meters["batch_t"].update(time.time() - t0)
                progress.display(it)
                tb.add_scalars(
                    {k: float(v) for k, v in metrics.items()}, host_step
                )
            else:
                meters["batch_t"].update(time.time() - t0)
            t0 = time.time()
        drain_losses()
        if is_multiprocess():
            # loss is already mesh-pmean'd per batch; this syncs the
            # host-side timing meters so the epoch summary is global
            # (reference: cross-GPU meter sync, main-avid.py:195-197)
            progress.synchronize_meters()
            progress.display(len(loader))

        state = state.with_epoch(epoch + 1)
        ckpt.save(int(state.step), state, milestone=(epoch + 1) in milestones)
        logger.add_line(f"epoch {epoch} done; checkpoint @ step {int(state.step)}")

        # held-out criterion loss (reference: run_phase 'test' every
        # test_freq epochs AND on the final epoch, main-avid.py:132-137)
        test_freq = int(cfg.get("test_freq", 1))
        if test_loader is not None and (
            epoch % max(test_freq, 1) == 0 or epoch == epochs - 1
        ):
            if eval_step is None:
                # preprocessing traced into the program: multi-process
                # batches are global arrays, which eager host-side
                # preprocessing cannot touch
                eval_step = make_fused_eval_step(
                    model, crit_cfg, mesh, pp_cfg, seed,
                    bank_sharding=bank_sharding,
                )
            test_loader.set_epoch(epoch)
            # buffer per-batch losses as DEVICE arrays and drain once at
            # the end — float() per batch would serialize host dispatch
            # against device compute, the exact pattern the train loop's
            # buffered drain exists to avoid (see pending_losses above)
            pending = []
            for it, batch in enumerate(device_prefetch(test_loader, mesh)):
                m = eval_step(state, batch, it)
                pending.append(m["loss"])
                if debug and it >= 1:
                    break
            if pending:
                losses = [float(x) for x in pending]  # one sync point
                test_loss = sum(losses) / len(losses)
                logger.add_line(f"test[{epoch}] loss {test_loss:.4e}")
                tb.add_scalar("test/loss", test_loss, int(state.step))

    if profiling_active:  # stop step beyond the run's last step
        profiling.stop_trace()
        logger.add_line(
            f"profiler: trace written to {model_dir}/profile "
            "(run ended inside the window)"
        )
    ckpt.wait_until_finished()  # saves are async; be durable before return
    return state


def build_model_with_warmstart(model_cfg: Config, logger: Optional[Logger] = None):
    model = builders.build_model(model_cfg)
    ck = model_cfg.get("args", {}).get("checkpoint")
    if ck and os.path.isfile(ck) and logger:
        logger.add_line(f"model warm-start available: {ck} (applied at init)")
    return model


def _init_bank(loss_cfg: Config, crit_cfg, pad_devices: int, seed: int,
               logger: Logger, template_only: bool = False):
    """AVID: fresh banks. AVID-CMA: banks+Z restored from the AVID
    checkpoint (criterions/avid_cma.py:308-319); the positive set comes
    back ZEROED — the caller mines it AFTER the state is distributed over
    the mesh, so the O(N^2 D) sweep runs on global arrays (the only legal
    place under multi-process execution). The checkpoint may be a
    reference-format `.pth.tar` OR a pretrain run done in this framework
    (a model_dir/orbax directory) — no torch detour needed.

    Returns HOST-side (process-identical) arrays; `pad_devices > 1` pads
    bank rows to a mesh multiple for the row-sharded layout (the caller's
    distribute_tree assigns the actual shardings). `template_only`: an
    orbax restore will overwrite the values — skip checkpoint loading and
    just build the right shapes."""
    from avid_cma_tpu.parallel.sharding import pad_bank_rows

    ck = loss_cfg.get("args", {}).get("checkpoint")
    if template_only:
        bank = init_bank_state(
            jax.random.key(0), crit_cfg.num_data, crit_cfg.embedding_dim
        )
    elif ck and os.path.isdir(ck):
        bank = import_criterion_orbax(ck)
        logger.add_line(
            f"restored banks from orbax run {ck} (z={float(bank.z):.4f})"
        )
    elif ck and os.path.isfile(ck):
        bank = import_criterion_pth_tar(ck)
        logger.add_line(f"restored banks from {ck} (z={float(bank.z):.4f})")
    else:
        bank = init_bank_state(
            jax.random.key(seed + 2), crit_cfg.num_data, crit_cfg.embedding_dim
        )
        if isinstance(crit_cfg, AVIDCMAConfig) and ck:
            logger.add_line(f"warning: CMA checkpoint {ck} missing; random banks")

    # A checkpoint from a sharded-bank run carries mesh-padded rows;
    # trim back to the corpus size so (a) replicated-mode mining never
    # sees the zero pad rows and (b) re-padding below matches THIS run's
    # device count, not the source run's.
    n = int(crit_cfg.num_data)
    if bank.view1_mem.shape[0] != n:
        if bank.view1_mem.shape[0] < n:
            raise ValueError(
                f"checkpoint banks have {bank.view1_mem.shape[0]} rows; "
                f"config num_data={n}"
            )
        logger.add_line(
            f"trimming restored banks {bank.view1_mem.shape[0]} -> {n} "
            "rows (source run's sharding pad)"
        )
        bank = bank.replace(
            view1_mem=bank.view1_mem[:n], view2_mem=bank.view2_mem[:n]
        )

    if isinstance(crit_cfg, AVIDCMAConfig):
        pos = jnp.zeros((crit_cfg.num_data, crit_cfg.pos_k), jnp.int32)
        bank = cma_state_from_bank(bank, pos)
    if pad_devices > 1:
        bank = bank.replace(**{
            f: pad_bank_rows(getattr(bank, f), pad_devices)
            for f in ("view1_mem", "view2_mem", "positive_set")
            if getattr(bank, f, None) is not None
        })
    return bank


def _mine(bank, crit_cfg, mesh, bank_sharded: bool) -> jax.Array:
    """The CMA positive-set sweep on the distributed bank, in whichever
    layout the bank lives in (avid_cma.py:320-321 analogue)."""
    if bank_sharded and mesh.size > 1:
        return mine_positives_sharded(
            bank.view1_mem, bank.view2_mem, crit_cfg.num_data,
            crit_cfg.pos_k, crit_cfg.sampling_type, mesh=mesh,
            exact=crit_cfg.mining_exact,
        )
    pos = mine_positives(
        bank.view1_mem, bank.view2_mem, crit_cfg.pos_k,
        crit_cfg.sampling_type, mesh=mesh, exact=crit_cfg.mining_exact,
    )
    if bank_sharded:  # padded layout even on a 1-device mesh
        from avid_cma_tpu.parallel.sharding import shard_bank

        pos = shard_bank(pos, mesh)
    return pos
