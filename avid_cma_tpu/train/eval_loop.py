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

import dataclasses
import os
import time
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from avid_cma_tpu.config import Config
from avid_cma_tpu.models.eval_wrappers import ClassificationWrapper, MOSTModel
from avid_cma_tpu.parallel.mesh import DATA_AXIS, make_mesh
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
            frames = jnp.concatenate(
                [frames, jnp.repeat(frames[-1:], pad, axis=0)], axis=0
            )
        out = sharded(params, batch_stats, frames)
        if isinstance(out, dict):
            return {k: v[:n] for k, v in out.items()}
        return out[:n]

    return fn


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _load_backbone(model_cfg: Config, which: str = "video_model"):
    """Pretrained backbone + its imported variables
    (reference: utils/eval_utils.py:332-344). Looks for a reference-format
    .pth.tar first, then for this framework's own orbax pretrain
    checkpoints (run_pretraining output)."""
    from avid_cma_tpu.registry import MODELS

    args = model_cfg["args"]
    backbone = MODELS.get(args["video_backbone"])(**dict(args["video_backbone_args"]))
    base = os.path.join(model_cfg["model_dir"], model_cfg["name"])
    variables = None

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
    with open(os.path.join(eval_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(eval_cfg.to_dict(), f)
    logger.log_config(eval_cfg)


def _preprocess_frames(batch, pp_cfg, key, train: bool):
    from avid_cma_tpu.data.pipelines import preprocess_batch

    out = preprocess_batch(key, {"frames": batch["frames"]}, pp_cfg, train=train)
    return out["frames"]


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
                    quiet=bool(eval_cfg.get("quiet")))
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
    dense_ds = builders.build_dataset(
        db, db.test_dense, mode="video", return_audio=False,
        return_labels=True, fold=fold,
    )
    workers = 1 if debug else int(eval_cfg.get("num_workers", 4))
    train_loader = builders.build_dataloader(train_ds, db, db.train, workers)
    test_loader = builders.build_dataloader(test_ds, db, db.test, workers)

    pp_cfg = builders.build_preprocess_config(db)
    sample_frames = _preprocess_frames(
        next(iter(train_loader)), pp_cfg, jax.random.key(0), True
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

    logits_fn = make_logits_fn(model, mesh)

    def clip_test(st, epoch, phase):
        """Per-epoch test phase (reference: eval-action-recg.py:83-97 runs
        run_phase('test', ...) after EVERY train epoch, warmup included)."""
        t1, t5 = _clip_eval(
            st, logits_fn, test_loader, pp_cfg,
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

    full_template = state.replace(opt_state=full_opt.init(state.params))
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
        state = _replicate_over(ckpt.restore(full_template), mesh)
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
        warm_opt = optax.masked(full_opt, classifier_only_mask(params))
        state = state.replace(opt_state=warm_opt.init(state.params))
        warm_step = make_supervised_train_step(model, warm_opt, mesh)
        state = _train_epochs(
            state, warm_step, train_loader, pp_cfg, warmup_epochs,
            logger, phase="warmup", debug=debug,
            on_epoch_end=lambda st, ep: clip_test(st, ep, "warmup"),
        )

    if not restored:
        state = state.replace(
            opt_state=full_opt.init(state.params), epoch=jnp.int32(0)
        )
    train_step = make_supervised_train_step(model, full_opt, mesh)

    if not eval_cfg.get("test_only"):

        def on_epoch_end(st, epoch):
            t1, _ = clip_test(st, epoch, "finetune")
            step = int(st.step)
            ckpt.save(step, st)
            if t1 > best["top1"]:
                best.update(top1=t1, step=step)
                best_ckpt.save(step, st, force=True)
                with open(best_path, "w") as f:
                    _json.dump(best, f)
                logger.add_line(f"new best Acc@1 {t1:6.2f} @ step {step}")

        state = _train_epochs(
            state, train_step, train_loader, pp_cfg, num_epochs, logger,
            phase="finetune", debug=debug, start_epoch=start_epoch,
            on_epoch_end=on_epoch_end,
        )

    # final clip eval at 25 clips/video (reference rebuilds the loaders
    # with clips_per_video=25 before the last test, eval-action-recg.py:102)
    final_test_cfg = Config(dict(db.test))
    final_test_cfg["clips_per_video"] = 5 if debug else 25
    final_test_ds = builders.build_dataset(
        db, final_test_cfg, return_audio=False, return_labels=True, fold=fold
    )
    test_loader = builders.build_dataloader(
        final_test_ds, db, final_test_cfg, workers
    )

    # reuse the logits_fn compiled during the per-epoch test phases —
    # rebuilding it here would discard the warm jit cache and recompile
    clip_top1, clip_top5 = _clip_eval(state, logits_fn, test_loader, pp_cfg)
    video_top1, video_top5 = _dense_eval(
        state, logits_fn, dense_ds, pp_cfg,
        batch_clips=int(db["batch_size"]), workers=workers,
    )
    results = {
        "clip@1": clip_top1, "clip@5": clip_top5,
        "video@1": video_top1, "video@5": video_top5,
    }
    logger.add_line(f"RESULTS {results}")
    return results


def _train_epochs(
    state, step_fn, loader, pp_cfg, epochs, logger, phase, debug,
    start_epoch: int = 0, seed: int = 123,
    on_epoch_end: Optional[Callable] = None,
):
    """Epoch loop for finetune/probe/warmup phases.

    Per-batch metrics are buffered as device arrays and drained at print
    points — reading `int(state.step)` or `float(loss)` every iteration
    would force a device sync per step (the pretrain loop's host-side
    counter pattern, train/loop.py). `on_epoch_end(state, epoch)` hooks the
    reference's per-epoch test + checkpoint protocol
    (eval-action-recg.py:83-98)."""
    host_step = int(state.step)
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        loss_m = AverageMeter("Loss", ":.4e")
        acc_m = AverageMeter("Acc@1", ":6.2f")
        progress = ProgressMeter(len(loader), [loss_m, acc_m], phase=phase,
                                 epoch=epoch, logger=logger)
        pending = []

        def drain():
            for metrics, logits, labels in pending:
                n = labels.shape[0]
                loss_m.update(float(metrics["loss"]), n=n)
                top1 = accuracy(np.asarray(logits), labels, (1,))[0]
                acc_m.update(top1, n=n)
            pending.clear()

        for it, batch in enumerate(loader):
            key = jax.random.fold_in(jax.random.key(seed), host_step)
            frames = _preprocess_frames(batch, pp_cfg, key, train=True)
            labels = np.asarray(batch["label"])
            state, metrics, logits = step_fn(state, frames, jnp.asarray(labels))
            host_step += 1
            pending.append((metrics, logits, labels))
            if it % 50 == 0 or it == len(loader) - 1:
                drain()
                progress.display(it)
            if debug and it >= 2:
                break
        drain()
        state = state.with_epoch(epoch + 1)
        if on_epoch_end is not None:
            on_epoch_end(state, epoch)
    return state


def _clip_eval(
    state, logits_fn, loader, pp_cfg, max_batches: Optional[int] = None
) -> Tuple[float, float]:
    all_logits, all_labels = [], []
    for it, batch in enumerate(loader):
        frames = _preprocess_frames(batch, pp_cfg, jax.random.key(0), train=False)
        logits = logits_fn(state.params, state.batch_stats, frames)
        all_logits.append(np.asarray(logits))
        all_labels.append(np.asarray(batch["label"]))
        if max_batches is not None and it + 1 >= max_batches:
            break
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    top1, top5 = accuracy(logits, labels, (1, 5))
    return top1, top5


def _dense_eval(
    state, logits_fn, dense_ds, pp_cfg, batch_clips: int, workers: int = 1,
    max_videos: Optional[int] = None,
) -> Tuple[float, float]:
    """Dense video eval: softmax over each chunk, averaged over chunks
    (reference: eval-action-recg.py:101-110 + BatchWrapper chunking).
    Whole-video decode dominates wall-clock, so items are fed through the
    prefetching loader (one video per 'batch') instead of a single-thread
    __getitem__ sweep."""
    from avid_cma_tpu.data.loader import DataLoader as _Loader

    n_videos = len(dense_ds) if max_videos is None else min(max_videos, len(dense_ds))
    loader = _Loader(
        dense_ds, batch_size=1, shuffle=False, drop_last=False,
        num_workers=max(workers, 1),
    )
    video_scores, video_labels = [], []
    for vi, sample in enumerate(loader):
        if vi >= n_videos:
            break
        frames = sample["frames"][0]  # (clips, T, H, W, C)
        probs = []
        for s in range(0, frames.shape[0], batch_clips):
            chunk = frames[s : s + batch_clips]
            f = _preprocess_frames(
                {"frames": chunk}, pp_cfg, jax.random.key(0), train=False
            )
            logits = logits_fn(state.params, state.batch_stats, f)
            probs.append(jax.nn.softmax(np.asarray(logits), axis=-1))
        video_scores.append(np.concatenate(probs).mean(axis=0))
        video_labels.append(np.asarray(sample["label"])[0])
    scores = np.stack(video_scores)
    labels = np.asarray(video_labels)
    top1, top5 = accuracy(scores, labels, (1, 5))
    return top1, top5


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
                    quiet=bool(eval_cfg.get("quiet")))
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
    train_loader = builders.build_dataloader(train_ds, db, db.train, workers)
    test_loader = builders.build_dataloader(test_ds, db, db.test, workers)
    pp_cfg = builders.build_preprocess_config(db)

    sample_frames = _preprocess_frames(
        next(iter(train_loader)), pp_cfg, jax.random.key(0), True
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
    optimizer = optax.masked(base_opt, classifier_only_mask(params))
    num_epochs = int(opt_cfg["num_epochs"]) if not debug else 1

    state = TrainState(
        step=jnp.int32(0), epoch=jnp.int32(0), params=params,
        batch_stats=batch_stats, opt_state=optimizer.init(params),
        bank=None, rng=jax.random.key(int(eval_cfg.get("seed", 0))),
    )
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

    # host-side step counter + buffered loss drains: no per-iteration
    # device sync (same pattern as _train_epochs / the pretrain loop)
    host_step = int(state.step)
    start_epoch = int(state.epoch)
    for epoch in range(start_epoch, num_epochs):
        train_loader.set_epoch(epoch)
        loss_m = AverageMeter("Loss", ":.4e")
        progress = ProgressMeter(len(train_loader), [loss_m], phase="probe",
                                 epoch=epoch, logger=logger)
        pending = []

        def drain():
            for arr, n in pending:
                loss_m.update(float(arr), n=n)
            pending.clear()

        for it, batch in enumerate(train_loader):
            key = jax.random.fold_in(jax.random.key(7), host_step)
            frames = _preprocess_frames(batch, pp_cfg, key, train=True)
            labels = jnp.asarray(batch["label"])
            state, metrics, _ = step_fn(state, frames, labels)
            host_step += 1
            pending.append((metrics["loss"], labels.shape[0]))
            if it % 50 == 0 or it == len(train_loader) - 1:
                drain()
                progress.display(it)
            if debug and it >= 2:
                break
        drain()
        # per-epoch save: probes survive preemption mid-run
        state = state.with_epoch(epoch + 1)
        ckpt.save(max(host_step, 1), state)

    # per-tap clip eval
    logits_fn = make_logits_fn(model, mesh)
    per_tap_logits: Dict[str, list] = {ft: [] for ft in model.feat_names}
    labels_all = []
    for batch in test_loader:
        frames = _preprocess_frames(batch, pp_cfg, jax.random.key(0), train=False)
        out = logits_fn(state.params, state.batch_stats, frames)
        for ft in model.feat_names:
            per_tap_logits[ft].append(np.asarray(out[ft]))
        labels_all.append(np.asarray(batch["label"]))
    labels = np.concatenate(labels_all)
    results = {}
    for ft in model.feat_names:
        logits = np.concatenate(per_tap_logits[ft])
        top1, top5 = accuracy(logits, labels, (1, 5))
        results[ft] = {"clip@1": top1, "clip@5": top5}

    # dense video eval: per-tap softmax-mean over uniformly spaced chunks
    # (reference protocol for the Kinetics linear Video@1 numbers,
    # eval-action-recg-linear.py final dense pass + BatchWrapper)
    if "test_dense" in db:
        dense_ds = builders.build_dataset(
            db, db.test_dense, mode="video", return_audio=False,
            return_labels=True, fold=fold,
        )
        n_videos = len(dense_ds) if not debug else min(4, len(dense_ds))
        tap_scores = {ft: [] for ft in model.feat_names}
        dense_labels = []
        batch_clips = int(db["batch_size"])
        # whole-video decode dominates dense-eval wall-clock: feed videos
        # through the prefetching loader like _dense_eval, not a
        # single-thread __getitem__ sweep
        from avid_cma_tpu.data.loader import DataLoader as _Loader

        dense_loader = _Loader(
            dense_ds, batch_size=1, shuffle=False, drop_last=False,
            num_workers=max(workers, 1),
        )
        for vi, batch1 in enumerate(dense_loader):
            if vi >= n_videos:
                break
            sample = {"frames": batch1["frames"][0],
                      "label": np.asarray(batch1["label"])[0]}
            frames = sample["frames"]
            probs = {ft: [] for ft in model.feat_names}
            for s in range(0, frames.shape[0], batch_clips):
                f = _preprocess_frames(
                    {"frames": frames[s : s + batch_clips]}, pp_cfg,
                    jax.random.key(0), train=False,
                )
                out = logits_fn(state.params, state.batch_stats, f)
                for ft in model.feat_names:
                    probs[ft].append(jax.nn.softmax(np.asarray(out[ft]), axis=-1))
            for ft in model.feat_names:
                tap_scores[ft].append(np.concatenate(probs[ft]).mean(axis=0))
            dense_labels.append(sample["label"])
        dl = np.asarray(dense_labels)
        for ft in model.feat_names:
            top1, top5 = accuracy(np.stack(tap_scores[ft]), dl, (1, 5))
            results[ft]["video@1"] = top1
            results[ft]["video@5"] = top5

    logger.add_line(f"RESULTS {results}")
    return results
