"""Action-recognition evaluation: full finetune and multi-tap linear probe.

Capability reference:
  * eval-action-recg.py:29-185 — UCF/HMDB full finetune: warmup phase
    training the classifier only (:74-84), epoch loop with periodic clip
    eval, final clip eval at clips_per_video=25 plus dense-video eval
    with softmax-mean over chunks (:100-110,154-157)
  * eval-action-recg-linear.py:29-195 — Kinetics linear probe over
    multiple frozen conv taps, per-tap meters/losses summed into one
    backward (:142-163), dict-output BatchWrapper (:181-195)
  * utils/eval_utils.py builders/wrappers

TPU-first: classifier/finetune steps are single jitted SPMD programs;
warmup vs full-finetune is an optax mask (no parameter-list surgery);
dense eval flattens (B, clips, ...) into the batch axis with chunking to
bound memory (BatchWrapper analogue).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from avid_cma_tpu.config import Config
from avid_cma_tpu.models.eval_wrappers import ClassificationWrapper, MOSTModel
from avid_cma_tpu.parallel.mesh import DATA_AXIS, make_mesh
from avid_cma_tpu.parallel.multihost import (
    distribute_tree,
    global_batch,
    is_multiprocess,
    process_local_slice,
    sync_any,
    sync_counts,
)
from avid_cma_tpu.train import builders
from avid_cma_tpu.train.checkpoint import CheckpointManager, import_model_pth_tar
from avid_cma_tpu.train.optim import build_from_config
from avid_cma_tpu.train.state import TrainState
from avid_cma_tpu.utils.logger import AverageMeter, Logger, ProgressMeter, accuracy


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------

def classifier_only_mask(params) -> dict:
    """True = trainable. One source of truth for the freeze rule:
    models/eval_wrappers.py:classifier_param_filter (reference filters
    'feature_extractor' params, eval-action-recg.py:77)."""
    from avid_cma_tpu.models.eval_wrappers import classifier_param_filter

    return jax.tree_util.tree_map_with_path(classifier_param_filter, params)


def classifier_only_optimizer(
    base_opt: optax.GradientTransformation, params
) -> optax.GradientTransformation:
    """Train the classifier head only, hard-freezing everything else.

    NOT optax.masked(base_opt, mask): masked passes the masked-OUT
    leaves' updates through as the RAW gradient, which apply_updates then
    ADDS to the 'frozen' params — unscaled gradient ascent on the
    pretrained backbone (verified against optax 0.2.6). set_to_zero makes
    frozen updates exactly zero regardless of the model's gradient flow."""
    labels = jax.tree.map(
        lambda t: "train" if t else "freeze", classifier_only_mask(params)
    )
    return optax.multi_transform(
        {"train": base_opt, "freeze": optax.set_to_zero()}, labels
    )


def make_supervised_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    multi_output: bool = False,
    axis: str = DATA_AXIS,
):
    """Cross-entropy finetune/probe step. For multi_output (MOSTModel),
    the per-tap losses are summed for one backward
    (eval-action-recg-linear.py:142-163)."""

    def local_step(state: TrainState, frames, labels):
        drop_rng = jax.random.fold_in(state.next_rng(), jax.lax.axis_index(axis))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mut = model.apply(
                variables, frames, train=True,
                mutable=["batch_stats"], rngs={"dropout": drop_rng},
            )
            if multi_output:
                losses = {
                    ft: optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels
                    ).mean()
                    for ft, logits in out.items()
                }
                total = sum(losses.values())
                return total, (losses, out, mut["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out, labels
            ).mean()
            return loss, ({"loss": loss}, out, mut["batch_stats"])

        (loss, (losses, logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, axis)
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        metrics = jax.lax.pmean({**losses, "loss": loss}, axis)
        return new_state, metrics, logits

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_logits_fn(model, mesh: Mesh, axis: str = DATA_AXIS):
    """Inference logits, data-sharded. Pads ragged batches up to a mesh
    multiple (test loaders use drop_last=False) and trims the output."""

    def local(params, batch_stats, frames):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, frames, train=False
        )

    n_dev = mesh.size
    sharded = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis)), out_specs=P(axis),
        )
    )

    def fn(params, batch_stats, frames):
        n = frames.shape[0]
        pad = (-n) % n_dev
        if pad:
            # multi-process callers (_apply_logits) pre-pad host-side:
            # eager concatenate/slice on global arrays is illegal
            frames = jnp.concatenate(
                [frames, jnp.repeat(frames[-1:], pad, axis=0)], axis=0
            )
        out = sharded(params, batch_stats, frames)
        if pad:
            if isinstance(out, dict):
                return {k: v[:n] for k, v in out.items()}
            return out[:n]
        return out

    return fn


def _apply_logits(logits_fn, state, frames, mesh: Mesh):
    """Inference logits on host-local preprocessed frames. Multi-process,
    every process contributes its rows to ONE global data-sharded batch
    (lockstep — all processes must call together with row counts padded
    to a local-device multiple so the global batch splits evenly) and
    gets back its own rows. Single-process this is a plain call."""
    if not is_multiprocess():
        out = logits_fn(state.params, state.batch_stats, frames)
        if isinstance(out, dict):
            return {k: np.asarray(v) for k, v in out.items()}
        return np.asarray(out)
    f = np.asarray(frames)
    n = f.shape[0]
    pad = (-n) % jax.local_device_count()
    if pad:
        f = np.concatenate([f, np.repeat(f[-1:], pad, axis=0)], axis=0)
    g = global_batch({"frames": f}, mesh)["frames"]
    out = logits_fn(state.params, state.batch_stats, g)
    if isinstance(out, dict):
        return {k: process_local_slice(v)[:n] for k, v in out.items()}
    return process_local_slice(out)[:n]


def _topk_counts(logits: np.ndarray, labels: np.ndarray,
                 maxk: int = 5) -> np.ndarray:
    """[correct@1, correct@maxk, total] — the cross-process-summable form
    of utils/logger.accuracy (reference meter sync reduces counts,
    utils/eval_utils.py:130-142)."""
    pred = np.argsort(-np.asarray(logits), axis=1)[:, :maxk]
    labels = np.asarray(labels)
    correct = pred == labels[:, None]
    return np.asarray(
        [correct[:, :1].any(axis=1).sum(), correct.any(axis=1).sum(),
         labels.shape[0]],
        np.int64,
    )


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _load_backbone(model_cfg: Config, which: str = "video_model",
                   weights: bool = True):
    """Pretrained backbone + its imported variables
    (reference: utils/eval_utils.py:332-344). Looks for a reference-format
    .pth.tar first, then for this framework's own orbax pretrain
    checkpoints (run_pretraining output). `weights=False` skips the
    checkpoint read entirely and returns (backbone, None) — for callers
    that only need the architecture (e.g. scripts/classify.py, whose
    weights come from the finetuned checkpoint)."""
    from avid_cma_tpu.registry import MODELS

    args = model_cfg["args"]
    # same computation-dtype resolution as the pretrain loop (bf16 on
    # TPU unless model.dtype overrides; params stay f32 so imported
    # checkpoints are untouched) — the benchmark protocol's hot loop
    # runs at the same precision the pretrain recipes train at
    backbone = MODELS.get(args["video_backbone"])(
        **dict(args["video_backbone_args"]),
        dtype=builders.resolve_compute_dtype(model_cfg.get("dtype", "auto")),
    )
    variables = None
    if not weights:
        return backbone, variables
    base = os.path.join(model_cfg["model_dir"], model_cfg["name"])

    pth = os.path.join(base, "checkpoint.pth.tar")
    orbax_dir = os.path.join(base, "orbax")
    if os.path.isfile(pth):
        full = import_model_pth_tar(pth)
        variables = {
            "params": full["params"][which],
            "batch_stats": full.get("batch_stats", {}).get(which, {}),
        }
    elif os.path.isdir(orbax_dir):
        raw = CheckpointManager(orbax_dir).restore_raw()
        if raw is not None:
            params = raw["params"][which]
            stats = (raw.get("batch_stats") or {}).get(which, {})
            variables = {"params": params, "batch_stats": stats}
    return backbone, variables


def _replicate_over(state, mesh: Mesh):
    """Orbax restores commit arrays to device 0 only; shard_map over the
    full mesh needs them replicated (or mesh-compatible)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def _dump_eval_config(eval_cfg, eval_dir: str, logger) -> None:
    """Persist the eval config into the eval dir and log it (reference
    utils/eval_utils.py:28-30 + main_utils.py:51-58)."""
    import yaml

    os.makedirs(eval_dir, exist_ok=True)
    if jax.process_index() == 0:  # shared filesystem under multi-host
        with open(os.path.join(eval_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(eval_cfg.to_dict(), f)
    logger.log_config(eval_cfg)


def _preprocess_frames(batch, pp_cfg, key, train: bool):
    from avid_cma_tpu.data.pipelines import preprocess_batch

    out = preprocess_batch(key, {"frames": batch["frames"]}, pp_cfg, train=train)
    return out["frames"]


def _probe_frames(ds, batch_size: int, pp_cfg):
    """Shape probe for model.init: decode ONE item and tile it to batch
    size (pattern of train/loop.py's probe) — a loader batch here would
    pay a full batch of video decode plus a prefetch worker-pool spin-up
    before the model even initializes."""
    frames = np.asarray(ds[0]["frames"])
    batch = {"frames": np.repeat(frames[None], max(batch_size, 1), axis=0)}
    return _preprocess_frames(batch, pp_cfg, jax.random.key(0), True)


def run_action_recognition(
    eval_cfg: Config, model_cfg: Config, fold: Optional[int] = None,
    debug: bool = False,
) -> Dict[str, float]:
    """Full finetune benchmark (reference: eval-action-recg.py)."""
    mesh = make_mesh()
    db = eval_cfg.dataset
    if debug:  # tiny batches like run_pretraining's debug mode
        db = Config(dict(db))
        db["batch_size"] = max(mesh.size * 2, 4)
    fold = fold if fold is not None else int(db.get("fold", 1))
    eval_dir = os.path.join(
        model_cfg["model_dir"], model_cfg["name"],
        f"eval-{eval_cfg.benchmark['name']}", f"fold-{fold:02d}",
    )
    logger = Logger(path=os.path.join(eval_dir, "eval.log"),
                    quiet=bool(eval_cfg.get("quiet")),
                    rank=jax.process_index())
    logger.add_line(f"finetune eval fold {fold} -> {eval_dir}")
    _dump_eval_config(eval_cfg, eval_dir, logger)

    backbone, bb_vars = _load_backbone(model_cfg)
    mcfg = eval_cfg.model
    model = ClassificationWrapper(
        feature_extractor=backbone,
        n_classes=int(mcfg["args"]["n_classes"]),
        feat_name=mcfg["args"].get("feat_name", "pool"),
        pooling_op=mcfg["args"].get("pooling_op"),
        use_dropout=bool(mcfg["args"].get("use_dropout", False)),
        dropout=float(mcfg["args"].get("dropout", 0.5)),
    )

    train_ds = builders.build_dataset(
        db, db.train, return_audio=False, return_labels=True, fold=fold
    )
    test_ds = builders.build_dataset(
        db, db.test, return_audio=False, return_labels=True, fold=fold
    )
    # optional like the probe's: a config without a test_dense block gets
    # clip metrics only rather than an AttributeError at startup
    dense_ds = None
    if "test_dense" in db:
        dense_ds = builders.build_dataset(
            db, db.test_dense, mode="video", return_audio=False,
            return_labels=True, fold=fold,
        )
    workers = 1 if debug else int(eval_cfg.get("num_workers", 4))
    # per-process loader shards (reference: distributed eval loaders,
    # utils/eval_utils.py:53-142)
    shard_kw = dict(num_shards=jax.process_count(),
                    shard_index=jax.process_index())
    train_loader = builders.build_dataloader(train_ds, db, db.train, workers,
                                             **shard_kw)
    test_loader = builders.build_dataloader(test_ds, db, db.test, workers,
                                            **shard_kw)

    pp_cfg = builders.build_preprocess_config(db)
    sample_frames = _probe_frames(
        train_ds, int(db["batch_size"]) // max(jax.process_count(), 1), pp_cfg
    )

    variables = model.init(
        jax.random.key(0), sample_frames, train=False
    )
    params = variables["params"]
    if bb_vars is not None:
        params = dict(params)
        params["feature_extractor"] = bb_vars["params"]
        batch_stats = dict(variables.get("batch_stats", {}))
        if bb_vars["batch_stats"]:
            batch_stats["feature_extractor"] = bb_vars["batch_stats"]
        logger.add_line("loaded pretrained backbone")
    else:
        batch_stats = variables.get("batch_stats", {})
        logger.add_line("warning: no pretrain checkpoint found; random backbone")

    opt_cfg = eval_cfg.optimizer
    steps_per_epoch = max(len(train_loader), 1)
    num_epochs = int(opt_cfg["num_epochs"]) if not debug else 1
    full_opt = build_from_config(opt_cfg, steps_per_epoch)

    state = TrainState(
        step=jnp.int32(0), epoch=jnp.int32(0), params=params,
        batch_stats=batch_stats, opt_state=None,
        bank=None, rng=jax.random.key(int(eval_cfg.get("seed", 0))),
    )
    # host-built process-identical state -> global arrays (multi-host
    # bridge; single-process this is plain replicated placement). All
    # later tree surgery (optimizer init, epoch bumps) runs under jit.
    state = distribute_tree(state, mesh)

    logits_fn = make_logits_fn(model, mesh)

    def clip_test(st, epoch, phase):
        """Per-epoch test phase (reference: eval-action-recg.py:83-97 runs
        run_phase('test', ...) after EVERY train epoch, warmup included)."""
        t1, t5 = _clip_eval(
            st, logits_fn, test_loader, pp_cfg, mesh,
            max_batches=2 if debug else None,
        )
        logger.add_line(f"{phase}-test[{epoch}] Acc@1 {t1:6.2f} Acc@5 {t5:6.2f}")
        return t1, t5

    # checkpoint/resume/test_only (reference: eval CheckpointManager,
    # utils/eval_utils.py:145-190; --test-only/--resume paths
    # eval-action-recg.py:33-36,66-68). Per-epoch saves make finetunes
    # preemption-safe; the best (top-1) checkpoint is persisted separately
    # (reference model_best.pth.tar, utils/main_utils.py:318-323).
    import json as _json

    ckpt = CheckpointManager(os.path.join(eval_dir, "orbax"))
    best_ckpt = CheckpointManager(
        os.path.join(eval_dir, "orbax_best"), max_to_keep=1
    )
    best_path = os.path.join(eval_dir, "best.json")
    best = {"top1": -1.0, "step": -1}
    if os.path.isfile(best_path):
        with open(best_path) as f:
            best = _json.load(f)

    if eval_cfg.get("test_only") and ckpt.latest_step() is None:
        # silently training a fresh head under --test-only would report
        # warmup-quality numbers as if they were the checkpoint's
        raise FileNotFoundError(
            f"test_only requested but no eval checkpoint under {eval_dir}"
        )
    restored = (
        bool(eval_cfg.get("resume") or eval_cfg.get("test_only"))
        and ckpt.latest_step() is not None
    )
    start_epoch = 0
    if restored:
        # restore template built only here: its Adam moments (~2x params)
        # would otherwise sit in HBM unused for the whole fresh-run path
        full_template = state.replace(
            opt_state=jax.jit(full_opt.init)(state.params)
        )
        state = _replicate_over(ckpt.restore(full_template), mesh)
        del full_template
        start_epoch = int(state.epoch)
        logger.add_line(
            f"restored eval checkpoint @ step {int(state.step)} "
            f"(epoch {start_epoch})"
        )
    elif opt_cfg.get("warmup_classifier"):
        # classifier-only phase (reference: eval-action-recg.py:74-84,
        # warmup_epochs defaulting to 5; only when starting from scratch).
        # NOTE: steps donate their input state, so the finetune state must
        # be derived from the warmup OUTPUT, never from pre-warmup buffers.
        warmup_epochs = 1 if debug else int(opt_cfg.get("warmup_epochs", 5))
        warm_opt = classifier_only_optimizer(full_opt, params)
        warm_step = make_supervised_train_step(model, warm_opt, mesh)
        # warmup has its own manager: its masked opt-state tree differs
        # from the finetune one, and preempting a 5-epoch warmup (each
        # with a full test pass) should not restart it from scratch
        warm_ckpt = CheckpointManager(os.path.join(eval_dir, "orbax_warmup"))
        warm_start = 0
        if eval_cfg.get("resume") and warm_ckpt.latest_step() is not None:
            warm_template = state.replace(
                opt_state=jax.jit(warm_opt.init)(state.params)
            )
            state = _replicate_over(warm_ckpt.restore(warm_template), mesh)
            del warm_template
            warm_start = int(state.epoch)
            logger.add_line(
                f"restored warmup checkpoint @ step {int(state.step)} "
                f"(epoch {warm_start})"
            )
        else:
            state = state.replace(
                opt_state=jax.jit(warm_opt.init)(state.params)
            )

        def on_warmup_epoch_end(st, epoch):
            clip_test(st, epoch, "warmup")
            warm_ckpt.save(max(int(st.step), 1), st)

        state = _train_epochs(
            state, warm_step, train_loader, pp_cfg, warmup_epochs,
            logger, phase="warmup", debug=debug, mesh=mesh,
            start_epoch=warm_start, on_epoch_end=on_warmup_epoch_end,
        )
        warm_ckpt.wait_until_finished()  # async saves durable

    if not restored:
        state = state.replace(
            opt_state=jax.jit(full_opt.init)(state.params)
        ).with_epoch(0)
    train_step = make_supervised_train_step(model, full_opt, mesh)

    if not eval_cfg.get("test_only"):

        def on_epoch_end(st, epoch):
            # t1 is globally synced (_clip_eval sums counts across
            # processes), so every process takes the same best branch and
            # the orbax saves stay collective
            t1, _ = clip_test(st, epoch, "finetune")
            step = int(st.step)
            ckpt.save(step, st)
            if t1 > best["top1"]:
                best.update(top1=t1, step=step)
                best_ckpt.save(step, st, force=True)
                if jax.process_index() == 0:
                    with open(best_path, "w") as f:
                        _json.dump(best, f)
                logger.add_line(f"new best Acc@1 {t1:6.2f} @ step {step}")

        state = _train_epochs(
            state, train_step, train_loader, pp_cfg, num_epochs, logger,
            phase="finetune", debug=debug, start_epoch=start_epoch,
            mesh=mesh, on_epoch_end=on_epoch_end,
        )

    # final clip eval at 25 clips/video (reference rebuilds the loaders
    # with clips_per_video=25 before the last test, eval-action-recg.py:102)
    final_test_cfg = Config(dict(db.test))
    final_test_cfg["clips_per_video"] = 5 if debug else 25
    final_test_ds = builders.build_dataset(
        db, final_test_cfg, return_audio=False, return_labels=True, fold=fold
    )
    test_loader = builders.build_dataloader(
        final_test_ds, db, final_test_cfg, workers, **shard_kw
    )

    # reuse the logits_fn compiled during the per-epoch test phases —
    # rebuilding it here would discard the warm jit cache and recompile
    clip_top1, clip_top5 = _clip_eval(state, logits_fn, test_loader, pp_cfg,
                                      mesh)
    results = {"clip@1": clip_top1, "clip@5": clip_top5}
    if dense_ds is not None:
        video_top1, video_top5 = _dense_eval(
            state, logits_fn, dense_ds, pp_cfg,
            batch_clips=int(db["batch_size"]), workers=workers, mesh=mesh,
        )
        results.update({"video@1": video_top1, "video@5": video_top5})
    logger.add_line(f"RESULTS {results}")
    # saves are async; all managers durable before returning
    ckpt.wait_until_finished()
    best_ckpt.wait_until_finished()
    return results


def _train_epochs(
    state, step_fn, loader, pp_cfg, epochs, logger, phase, debug,
    start_epoch: int = 0, seed: int = 123,
    mesh: Optional[Mesh] = None,
    on_epoch_end: Optional[Callable] = None,
    track_accuracy: bool = True,
):
    """Epoch loop for finetune/probe/warmup phases.

    Per-batch metrics are buffered as device arrays and drained at print
    points — reading `int(state.step)` or `float(loss)` every iteration
    would force a device sync per step (the pretrain loop's host-side
    counter pattern, train/loop.py). `on_epoch_end(state, epoch)` hooks the
    reference's per-epoch test + checkpoint protocol
    (eval-action-recg.py:83-98). `track_accuracy=False` for steps whose
    logits are a per-tap dict (the linear probe)."""
    host_step = int(state.step)
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        loss_m = AverageMeter("Loss", ":.4e")
        acc_m = AverageMeter("Acc@1", ":6.2f")
        meters = [loss_m, acc_m] if track_accuracy else [loss_m]
        progress = ProgressMeter(len(loader), meters, phase=phase,
                                 epoch=epoch, logger=logger)
        pending = []

        def drain():
            # minimize D2H round-trips: per-item float() fetches
            # serialize one RPC per batch (~40 ms each on a tunneled
            # runtime — the same pathology measured and fixed in the
            # pretrain loop's drain_losses, train/loop.py). Scalars are
            # stacked on device and fetched once; logits copies are
            # started async so their latencies overlap.
            if not pending:
                return
            for _, logits, _ in pending:
                if track_accuracy and hasattr(logits, "copy_to_host_async"):
                    logits.copy_to_host_async()
            losses = np.asarray(
                jnp.stack([m["loss"] for m, _, _ in pending])
            )
            for (metrics, logits, labels), lv in zip(pending, losses):
                n = labels.shape[0]
                loss_m.update(float(lv), n=n)
                if track_accuracy:
                    # logits come back data-sharded: this process's rows
                    # pair with its local labels
                    top1 = accuracy(
                        process_local_slice(logits), labels, (1,)
                    )[0]
                    acc_m.update(top1, n=n)
            pending.clear()

        for it, batch in enumerate(loader):
            # fold the process index in: preprocessing runs host-side on
            # each process's local rows, so a shared key would hand every
            # process the SAME per-row crop/flip/jitter draws (the
            # pretrain loop avoids this by augmenting the assembled
            # global batch in-graph, train/step.py)
            key = jax.random.fold_in(jax.random.key(seed), host_step)
            key = jax.random.fold_in(key, jax.process_index())
            frames = _preprocess_frames(batch, pp_cfg, key, train=True)
            labels = np.asarray(batch["label"])
            if is_multiprocess():
                gb = global_batch(
                    {"frames": np.asarray(frames), "label": labels}, mesh
                )
                frames_in, labels_in = gb["frames"], gb["label"]
            else:
                frames_in, labels_in = frames, jnp.asarray(labels)
            state, metrics, logits = step_fn(state, frames_in, labels_in)
            host_step += 1
            pending.append((metrics, logits, labels))
            if it % 50 == 0 or it == len(loader) - 1:
                drain()
                progress.display(it)
            if debug and it >= 2:
                break
        drain()
        if is_multiprocess():
            # loss is mesh-pmean'd already; this syncs the host-side
            # accuracy meter so the epoch line is global (reference:
            # cross-GPU meter sync, utils/logger.py:73-79)
            progress.synchronize_meters()
            progress.display(len(loader))
        state = state.with_epoch(epoch + 1)
        if on_epoch_end is not None:
            on_epoch_end(state, epoch)
    return state


def _shard_real_rows(loader) -> int:
    """Rows of this process's shard that are REAL dataset items. The
    sampler pads every shard to equal length by repeating head indices
    (data/loader.py ShardedBatchSampler); the duplicates land at the
    shard's tail, so counting only the first `n_real` rows makes eval
    metrics invariant to the process count."""
    s = loader.sampler
    return len(range(s.shard_index, s.dataset_len, s.num_shards))


def _clip_eval(
    state, logits_fn, loader, pp_cfg, mesh: Mesh,
    max_batches: Optional[int] = None,
) -> Tuple[float, float]:
    """Clip-level accuracy. Multi-process: the loader is already this
    process's shard; local correct@k counts are summed across processes
    (reference: distributed test loaders + meter sync,
    utils/eval_utils.py:53-142). Sampler pad duplicates are excluded
    from the counts (every process still dispatches every batch — the
    lockstep global logits calls must stay collective)."""
    counts = np.zeros(3, np.int64)
    n_real = _shard_real_rows(loader)
    seen = 0
    for it, batch in enumerate(loader):
        frames = _preprocess_frames(batch, pp_cfg, jax.random.key(0), train=False)
        logits = _apply_logits(logits_fn, state, frames, mesh)
        rows = int(np.asarray(batch["label"]).shape[0])
        k = max(0, min(rows, n_real - seen))
        if k:
            counts += _topk_counts(logits[:k], batch["label"][:k])
        seen += rows
        if max_batches is not None and it + 1 >= max_batches:
            break
    c1, c5, n = sync_counts(counts)
    n = max(int(n), 1)
    return 100.0 * c1 / n, 100.0 * c5 / n


def _dense_eval(
    state, logits_fn, dense_ds, pp_cfg, batch_clips: int, workers: int = 1,
    max_videos: Optional[int] = None, mesh: Optional[Mesh] = None,
):
    """Dense video eval: softmax over every clip, averaged per video
    (reference: eval-action-recg.py:101-110 + BatchWrapper chunking).

    (video, clip) work is FLATTENED into one row queue feeding fixed-size
    device batches, so device utilization is bounded by the queue, not by
    one video's clip count (a 25-clip video no longer serializes into
    ragged sub-batches). Whole-video decode dominates host wall-clock, so
    videos stream through the prefetching loader. Multi-process: videos
    are round-robin sharded per process and every flush is a lockstep
    global dispatch (idle processes pump dummy rows until all queues
    drain); per-video correct@k counts are summed across processes.

    Returns (top1, top5), or {tap: (top1, top5)} for multi-tap models."""
    from avid_cma_tpu.data.loader import DataLoader as _Loader

    mesh = mesh if mesh is not None else make_mesh()
    nproc = jax.process_count()
    rank = jax.process_index()
    total = len(dense_ds) if max_videos is None else min(max_videos, len(dense_ds))
    # round-robin sharding (ShardedBatchSampler, shuffle=False):
    # local item i has global index rank + i*nproc
    n_local = len(range(rank, total, nproc))
    loader = _Loader(
        dense_ds, batch_size=1, shuffle=False, drop_last=False,
        num_workers=max(workers, 1), num_shards=nproc, shard_index=rank,
    )
    # fixed flush size: `batch_clips` is the GLOBAL batch (like every
    # other loader, whose build divides batch_size by num_shards), so
    # each process flushes its 1/nproc share, rounded up to a
    # local-device multiple so the assembled global batch splits evenly
    # across the mesh
    ld = jax.local_device_count() if is_multiprocess() else 1
    per_proc = -(-int(batch_clips) // nproc)
    rows_per_flush = max(ld, -(-per_proc // ld) * ld)

    prob_sum: list = []  # per local video: tap -> running prob sum
    clip_cnt: list = []
    labels_loc: list = []

    def row_gen():
        for vi, sample in enumerate(loader):
            if vi >= n_local:
                break
            frames = np.asarray(sample["frames"][0])  # (clips, T, H, W, C)
            slot = len(labels_loc)
            labels_loc.append(np.asarray(sample["label"])[0])
            prob_sum.append(None)
            clip_cnt.append(0)
            for c in range(frames.shape[0]):
                yield slot, frames[c]

    gen = row_gen()
    pending_rows: list = []
    pending_slots: list = []
    template_row = None
    seen_taps: Optional[list] = None
    exhausted = False
    while True:
        while len(pending_rows) < rows_per_flush and not exhausted:
            try:
                slot, row = next(gen)
            except StopIteration:
                exhausted = True
                break
            pending_rows.append(row)
            pending_slots.append(slot)
            template_row = row
        has_work = bool(pending_rows)
        if not sync_any(has_work):
            break
        k = len(pending_rows)
        if k:
            arr = np.stack(pending_rows[:rows_per_flush])
            slots = pending_slots[: arr.shape[0]]
            del pending_rows[: arr.shape[0]]
            del pending_slots[: arr.shape[0]]
        else:  # drained early: pump dummy rows to keep the lockstep
            if template_row is None:
                # a process that owns zero videos never saw a real row;
                # decode one item for the (fixed) clip shape
                template_row = np.asarray(dense_ds[0]["frames"])[0]
            arr = np.zeros((0,) + tuple(np.shape(template_row)),
                           dtype=np.asarray(template_row).dtype)
            slots = []
        k = arr.shape[0]
        if k < rows_per_flush:
            filler = arr[-1:] if k else np.zeros(
                (1,) + tuple(np.shape(template_row)),
                dtype=np.asarray(template_row).dtype,
            )
            arr = np.concatenate(
                [arr, np.repeat(filler, rows_per_flush - k, axis=0)], axis=0
            )
        f = _preprocess_frames(
            {"frames": arr}, pp_cfg, jax.random.key(0), train=False
        )
        out = _apply_logits(logits_fn, state, f, mesh)
        multi_tap = isinstance(out, dict)
        taps = list(out.keys()) if multi_tap else [None]
        seen_taps = taps
        for tap in taps:
            logits = out[tap] if multi_tap else out
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[:k]), axis=-1))
            for s, p in zip(slots, probs):
                if prob_sum[s] is None:
                    prob_sum[s] = {t: 0.0 for t in taps}
                prob_sum[s][tap] = prob_sum[s][tap] + p
        for s in slots:
            clip_cnt[s] += 1

    # per-video means -> correct@k counts -> cross-process sum (tap list
    # from the flushes, NOT local videos: a zero-video process must still
    # make the same number of sync_counts calls as everyone else)
    taps = seen_taps if seen_taps is not None else [None]
    results = {}
    for tap in taps:
        scored = [
            (ps[tap] / max(c, 1), lb)
            for ps, c, lb in zip(prob_sum, clip_cnt, labels_loc)
            if ps is not None
        ]
        if scored:
            counts = _topk_counts(
                np.stack([s for s, _ in scored]),
                np.asarray([l for _, l in scored]),
            )
        else:
            counts = np.zeros(3, np.int64)
        c1, c5, n = sync_counts(counts)
        n = max(int(n), 1)
        results[tap] = (100.0 * c1 / n, 100.0 * c5 / n)
    if list(results.keys()) == [None]:
        return results[None]
    return results


def run_linear_probe(
    eval_cfg: Config, model_cfg: Config, fold: int = 1, debug: bool = False
) -> Dict[str, Dict[str, float]]:
    """Frozen multi-tap linear probe (reference: eval-action-recg-linear.py)."""
    mesh = make_mesh()
    db = eval_cfg.dataset
    if debug:  # tiny batches like run_pretraining's debug mode
        db = Config(dict(db))
        db["batch_size"] = max(mesh.size * 2, 4)
    eval_dir = os.path.join(
        model_cfg["model_dir"], model_cfg["name"],
        f"eval-{eval_cfg.benchmark['name']}", f"fold-{fold:02d}",
    )
    logger = Logger(path=os.path.join(eval_dir, "eval.log"),
                    quiet=bool(eval_cfg.get("quiet")),
                    rank=jax.process_index())
    _dump_eval_config(eval_cfg, eval_dir, logger)

    backbone, bb_vars = _load_backbone(model_cfg)
    margs = eval_cfg.model["args"]
    model = MOSTModel(
        feature_extractor=backbone,
        n_classes=int(margs["n_classes"]),
        feat_names=list(margs["feat_names"]),
        pooling_ops=list(margs["pooling_ops"]),
        l2_norm=margs.get("l2_norm"),
        use_bn=bool(margs.get("use_bn", True)),
        use_dropout=bool(margs.get("use_dropout", False)),
    )

    train_ds = builders.build_dataset(
        db, db.train, return_audio=False, return_labels=True, fold=fold
    )
    test_ds = builders.build_dataset(
        db, db.test, return_audio=False, return_labels=True, fold=fold
    )
    workers = 1 if debug else int(eval_cfg.get("num_workers", 4))
    shard_kw = dict(num_shards=jax.process_count(),
                    shard_index=jax.process_index())
    train_loader = builders.build_dataloader(train_ds, db, db.train, workers,
                                             **shard_kw)
    test_loader = builders.build_dataloader(test_ds, db, db.test, workers,
                                            **shard_kw)
    pp_cfg = builders.build_preprocess_config(db)

    sample_frames = _probe_frames(
        train_ds, int(db["batch_size"]) // max(jax.process_count(), 1), pp_cfg
    )
    variables = model.init(jax.random.key(0), sample_frames, train=False)
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    if bb_vars is not None:
        params["feature_extractor"] = bb_vars["params"]
        if bb_vars["batch_stats"]:
            batch_stats["feature_extractor"] = bb_vars["batch_stats"]
        logger.add_line("loaded pretrained backbone (frozen)")

    opt_cfg = eval_cfg.optimizer
    steps_per_epoch = max(len(train_loader), 1)
    base_opt = build_from_config(opt_cfg, steps_per_epoch)
    # hard freeze (MOSTModel also stop_gradients its features, so these
    # updates are zero either way — but the optimizer must not rely on it)
    optimizer = classifier_only_optimizer(base_opt, params)
    num_epochs = int(opt_cfg["num_epochs"]) if not debug else 1

    state = TrainState(
        step=jnp.int32(0), epoch=jnp.int32(0), params=params,
        batch_stats=batch_stats, opt_state=optimizer.init(params),
        bank=None, rng=jax.random.key(int(eval_cfg.get("seed", 0))),
    )
    # host-built process-identical state -> global arrays over the mesh
    state = distribute_tree(state, mesh)
    step_fn = make_supervised_train_step(model, optimizer, mesh, multi_output=True)

    # probe checkpointing (reference: MOSTCheckpointManager classifier-only
    # saves, utils/eval_utils.py:245-295; orbax saves the full state here —
    # a superset that also restores BN stats exactly)
    ckpt = CheckpointManager(os.path.join(eval_dir, "orbax"))
    if eval_cfg.get("test_only") and ckpt.latest_step() is None:
        raise FileNotFoundError(
            f"test_only requested but no probe checkpoint under {eval_dir}"
        )
    if (eval_cfg.get("resume") or eval_cfg.get("test_only")) and (
        ckpt.latest_step() is not None
    ):
        state = _replicate_over(ckpt.restore(state), mesh)
        logger.add_line(f"restored probe checkpoint @ step {int(state.step)}")
    if eval_cfg.get("test_only"):
        num_epochs = 0

    # shared epoch loop (per-tap dict logits -> no accuracy meter);
    # per-epoch saves make probes survive preemption mid-run
    state = _train_epochs(
        state, step_fn, train_loader, pp_cfg, num_epochs, logger,
        phase="probe", debug=debug, start_epoch=int(state.epoch), seed=7,
        mesh=mesh, track_accuracy=False,
        on_epoch_end=lambda st, ep: ckpt.save(max(int(st.step), 1), st),
    )

    # per-tap clip eval (local correct@k counts, summed across processes)
    logits_fn = make_logits_fn(model, mesh)
    tap_counts: Dict[str, np.ndarray] = {
        ft: np.zeros(3, np.int64) for ft in model.feat_names
    }
    n_real = _shard_real_rows(test_loader)
    seen = 0
    for batch in test_loader:
        frames = _preprocess_frames(batch, pp_cfg, jax.random.key(0), train=False)
        out = _apply_logits(logits_fn, state, frames, mesh)
        labels = np.asarray(batch["label"])
        k = max(0, min(labels.shape[0], n_real - seen))  # drop sampler pads
        if k:
            for ft in model.feat_names:
                tap_counts[ft] += _topk_counts(out[ft][:k], labels[:k])
        seen += labels.shape[0]
    results = {}
    for ft in model.feat_names:
        c1, c5, n = sync_counts(tap_counts[ft])
        n = max(int(n), 1)
        results[ft] = {"clip@1": 100.0 * c1 / n, "clip@5": 100.0 * c5 / n}

    # dense video eval: per-tap softmax-mean over uniformly spaced chunks
    # (reference protocol for the Kinetics linear Video@1 numbers,
    # eval-action-recg-linear.py final dense pass + BatchWrapper)
    if "test_dense" in db:
        dense_ds = builders.build_dataset(
            db, db.test_dense, mode="video", return_audio=False,
            return_labels=True, fold=fold,
        )
        dense = _dense_eval(
            state, logits_fn, dense_ds, pp_cfg,
            batch_clips=int(db["batch_size"]), workers=workers,
            max_videos=min(4, len(dense_ds)) if debug else None, mesh=mesh,
        )
        for ft in model.feat_names:
            top1, top5 = dense[ft]
            results[ft]["video@1"] = top1
            results[ft]["video@5"] = top5

    logger.add_line(f"RESULTS {results}")
    ckpt.wait_until_finished()  # async saves durable before returning
    return results
