"""Checkpointing: orbax-native + torch `.pth.tar` interop.

Capability reference: utils/main_utils.py:265-323 (CheckpointManager:
`checkpoint.pth.tar` + milestone-named copies + `model_best.pth.tar`,
rank-0 only; checkpoint dict {'epoch','model','optimizer',
'train_criterion'} — the criterion entry carries the memory banks and the
frozen NCE partition function, which AVID-CMA init restores from
(criterions/avid_cma.py:308-319)).

TPU-native: orbax saves the whole TrainState pytree (params, BN stats,
optimizer state, banks, Z, epoch) atomically — preemption-safe, resumable
mid-epoch. The torch converters preserve checkpoint-level fidelity with
the released `.pth.tar` files in both directions (key map: `module.`
strip, conv OIDHW->DHWIO transpose, BN weight/bias->scale/bias,
view1_mem/view2_mem/avg_exp_score -> BankState).
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avid_cma_tpu.criterions.avid import BankState


# ---------------------------------------------------------------------------
# torch <-> flax key/value mapping
# ---------------------------------------------------------------------------

def _to_flax_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv/linear weight -> flax kernel layout."""
    if w.ndim == 5:  # (O, I, D, H, W) -> (D, H, W, I, O)
        return np.transpose(w, (2, 3, 4, 1, 0))
    if w.ndim == 4:  # (O, I, H, W) -> (H, W, I, O)
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 2:  # (O, I) -> (I, O)
        return np.transpose(w, (1, 0))
    return w


def _to_torch_weight(k: np.ndarray) -> np.ndarray:
    if k.ndim == 5:
        return np.transpose(k, (4, 3, 0, 1, 2))
    if k.ndim == 4:
        return np.transpose(k, (3, 2, 0, 1))
    if k.ndim == 2:
        return np.transpose(k, (1, 0))
    return k


def _torch_key_to_flax(key: str) -> Optional[Tuple[Tuple[str, ...], str, str]]:
    """Map one reference state-dict key to (flax module path, leaf name,
    collection). Returns None for ignorable keys (num_batches_tracked).

    Reference key shapes (models/video.py, audio.py, av_wrapper.py):
      video_model.conv1.{0,1}.*            stem conv + BN (Sequential)
      video_model.conv{2..5}x.<i>.<sub>.*  R2P1D blocks (possibly Sequential)
      video_model.conv{2..5}x.<sub>.*      depth-10: bare block
      audio_model.conv1.{0,1}.*            stem (Sequential)
      audio_model.block{1..4}.<sub>.*      Basic2DBlocks
      {video,audio}_proj.projection.<i>.*  MLP Linear layers
    """
    key = re.sub(r"^module\.", "", key)
    parts = key.split(".")
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None

    is_bn_stat = leaf in ("running_mean", "running_var")
    coll = "batch_stats" if is_bn_stat else "params"

    def bn_leaf() -> str:
        return {
            "weight": "scale",
            "bias": "bias",
            "running_mean": "mean",
            "running_var": "var",
        }[leaf]

    tower = parts[0]  # video_model | audio_model | video_proj | audio_proj
    if tower in ("video_proj", "audio_proj"):
        # projection.<i> with Linears at even indices (ReLU between)
        i = int(parts[2])
        return (tower, f"linear{i // 2}"), ("kernel" if leaf == "weight" else "bias"), "params"

    rest = parts[1:]
    if tower in ("video_model", "audio_model") and rest[0] == "conv1":
        # Sequential: 0 = conv, 1 = BN
        if rest[1] == "0":
            return (tower, "conv1"), "kernel", "params"
        return (tower, "bn1"), bn_leaf(), coll

    if tower == "audio_model" and rest[0].startswith("block"):
        sub = rest[1]  # conv1/bn1/conv2/bn2
        if sub.startswith("conv"):
            return (tower, rest[0], sub), "kernel", "params"
        return (tower, rest[0], sub), bn_leaf(), coll

    if tower == "video_model" and re.match(r"conv\dx", rest[0]):
        stage = rest[0]
        if rest[1].isdigit():  # Sequential of blocks
            block_idx, sub = int(rest[1]), rest[2]
        else:  # depth-10 bare block
            block_idx, sub = 0, rest[1]
        name = f"{stage}_{block_idx}"
        if "conv" in sub:
            return (tower, name, sub), "kernel", "params"
        return (tower, name, sub), bn_leaf(), coll

    raise KeyError(f"unmapped torch key: {key}")


def torch_state_to_flax(
    state_dict: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """Reference model state_dict -> {'params': ..., 'batch_stats': ...}."""
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key, val in state_dict.items():
        mapped = _torch_key_to_flax(key)
        if mapped is None:
            continue
        path, leaf, coll = mapped
        arr = np.asarray(val)
        if leaf == "kernel":
            arr = _to_flax_kernel(arr)
        node = out[coll]
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(arr)
    return out


def flax_to_torch_state(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax variables -> reference-format state_dict."""
    out: Dict[str, np.ndarray] = {}

    # the reference's depth-10 stages are BARE blocks (conv2x.spt_conv1),
    # not 1-element Sequentials (conv2x.0.spt_conv1) — models/video.py:27-31
    # vs :32-37 — so single-block stages must export bare keys or torch
    # load_state_dict rejects the file (the importer handles both forms)
    stage_blocks: Dict[str, int] = {}
    for k in variables.get("params", {}).get("video_model", {}):
        m = re.match(r"(conv\dx)_(\d+)$", k)
        if m:
            stage_blocks[m.group(1)] = max(
                stage_blocks.get(m.group(1), 0), int(m.group(2)) + 1
            )

    def emit(key: str, val: np.ndarray):
        out[key] = val

    def walk_params(path, node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk_params(path + [k], v)
            else:
                emit_key(path, k, np.asarray(v))

    def emit_key(path, leaf, arr):
        tower = path[0]
        if tower in ("video_proj", "audio_proj"):
            i = int(path[1].replace("linear", "")) * 2
            suffix = "weight" if leaf == "kernel" else "bias"
            arr = _to_torch_weight(arr) if leaf == "kernel" else arr
            emit(f"{tower}.projection.{i}.{suffix}", arr)
            return
        rest = path[1:]
        if rest[0] == "conv1":
            emit(f"{tower}.conv1.0.weight", _to_torch_weight(arr))
            return
        if rest[0] == "bn1":
            emit(f"{tower}.conv1.1.{_bn_suffix(leaf)}", arr)
            return
        if tower == "audio_model":
            sub = rest[1]
            if leaf == "kernel":
                emit(f"{tower}.{rest[0]}.{sub}.weight", _to_torch_weight(arr))
            else:
                emit(f"{tower}.{rest[0]}.{sub}.{_bn_suffix(leaf)}", arr)
            return
        # video stages conv{2..5}x_<i>
        stage, idx = rest[0].rsplit("_", 1)
        if stage_blocks.get(stage, 2) == 1:  # depth-10 bare block
            prefix = f"{tower}.{stage}"
        else:
            prefix = f"{tower}.{stage}.{idx}"
        sub = rest[1]
        if leaf == "kernel":
            emit(f"{prefix}.{sub}.weight", _to_torch_weight(arr))
        else:
            emit(f"{prefix}.{sub}.{_bn_suffix(leaf)}", arr)

    def _bn_suffix(leaf):
        return {
            "scale": "weight", "bias": "bias", "mean": "running_mean",
            "var": "running_var",
        }[leaf]

    walk_params([], variables["params"])
    walk_params([], variables.get("batch_stats", {}))
    return out


# ---------------------------------------------------------------------------
# .pth.tar import/export (torch only needed when actually used)
# ---------------------------------------------------------------------------

def import_model_pth_tar(path: str) -> Dict[str, Any]:
    """Reference pretrain checkpoint -> flax variables
    (reference loader strips `module.`: utils/eval_utils.py:337-339)."""
    import torch

    ckp = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = ckp["model"] if "model" in ckp else ckp
    model_sd = {k: v.numpy() for k, v in model_sd.items()}
    return torch_state_to_flax(model_sd)


def import_criterion_pth_tar(path: str) -> BankState:
    """Restore banks + frozen Z from a reference checkpoint's
    train_criterion (reference: criterions/avid_cma.py:308-319 — Z is the
    mean over every avg_exp_score buffer)."""
    import torch

    ckp = torch.load(path, map_location="cpu", weights_only=False)
    crit = ckp["train_criterion"]
    zs = [np.asarray(v) for k, v in crit.items() if "avg_exp_score" in k]
    return BankState(
        view1_mem=jnp.asarray(np.asarray(crit["nce_average.view1_mem"])),
        view2_mem=jnp.asarray(np.asarray(crit["nce_average.view2_mem"])),
        z=jnp.float32(np.mean([z.item() for z in zs]) if zs else -1.0),
    )


def _restore_raw_orbax(path: str) -> Dict[str, Any]:
    """Latest raw checkpoint of a framework pretrain run. `path` may be
    the run's model_dir (containing `orbax/`), the orbax directory
    itself, or a specific step directory's parent."""
    orbax_dir = path
    if os.path.isdir(os.path.join(path, "orbax")):
        orbax_dir = os.path.join(path, "orbax")
    raw = CheckpointManager(orbax_dir).restore_raw()
    if raw is None:
        raise FileNotFoundError(f"no orbax checkpoint under {orbax_dir}")
    return raw


def import_criterion_orbax(path: str) -> BankState:
    """Restore banks + frozen Z from a pretrain run done IN THIS FRAMEWORK
    (torch-free CMA warm-start; reference capability:
    criterions/avid_cma.py:308-319 restores from the AVID .pth.tar)."""
    bank = _restore_raw_orbax(path)["bank"]
    return BankState(
        view1_mem=jnp.asarray(bank["view1_mem"]),
        view2_mem=jnp.asarray(bank["view2_mem"]),
        z=jnp.asarray(bank["z"], jnp.float32),
    )


def import_model_orbax(path: str) -> Dict[str, Any]:
    """Restore model variables (params + batch_stats) from a pretrain run
    done IN THIS FRAMEWORK — the model half of the torch-free AVID->CMA
    chain (reference warm-starts from the AVID .pth.tar,
    utils/eval_utils.py:337-339)."""
    raw = _restore_raw_orbax(path)
    return {
        "params": raw["params"],
        "batch_stats": raw.get("batch_stats", {}),
    }


def reference_parameter_order(keys) -> list:
    """Sort torch-format PARAMETER keys (buffers excluded) into the
    reference `model.parameters()` registration order — the order torch
    optimizers index their per-parameter state by (`state[i]` pairs with
    `param_groups[0]['params'][i]`). Derived from the reference module
    definitions: av_wrapper.py:36-48 (video_model, audio_model,
    video_proj, audio_proj), video.py:19-41 / audio.py:20-31 (stem then
    stages/blocks), network_blocks.py:13-51 (attribute order within each
    block); torch yields a module's own params (weight before bias)
    before recursing into children in registration order."""
    TOWERS = {"video_model": 0, "audio_model": 1,
              "video_proj": 2, "audio_proj": 3}
    R2P1D = {"spt_conv1": 0, "spt_bn1": 1, "tmp_conv1": 2, "tmp_bn1": 3,
             "spt_conv2": 4, "spt_bn2": 5, "tmp_conv2": 6, "out_bn": 7,
             "res_conv": 8}
    BASIC2D = {"conv1": 0, "bn1": 1, "conv2": 2, "bn2": 3}
    LEAF = {"weight": 0, "bias": 1}

    def sort_key(key):
        parts = re.sub(r"^module\.", "", key).split(".")
        tower, rest, leaf = parts[0], parts[1:-1], parts[-1]
        if tower in ("video_proj", "audio_proj"):
            # projection.<i>.{weight,bias}
            return (TOWERS[tower], int(rest[1]), 0, 0, LEAF[leaf])
        if rest[0] == "conv1":  # stem Sequential: 0=conv, 1=BN
            return (TOWERS[tower], 0, int(rest[1]), 0, LEAF[leaf])
        if tower == "audio_model":  # block<i>.<sub>
            return (TOWERS[tower], int(rest[0][-1]), 0,
                    BASIC2D[rest[1]], LEAF[leaf])
        # video stages conv{2..5}x[.<block_idx>].<sub>
        stage = int(rest[0][4])  # conv2x -> 2
        if rest[1].isdigit():
            block, sub = int(rest[1]), rest[2]
        else:
            block, sub = 0, rest[1]  # depth-10 bare block
        return (TOWERS[tower], stage, block, R2P1D[sub], LEAF[leaf])

    param_keys = [
        k for k in keys
        if k.rsplit(".", 1)[-1] in ("weight", "bias")
        and "running_" not in k and "num_batches" not in k
    ]
    return sorted(param_keys, key=sort_key)


def _leaf(node, name):
    """Attribute-or-key access: works on typed optax states AND raw
    orbax-restored nested dicts."""
    if isinstance(node, dict):
        return node.get(name)
    return getattr(node, name, None)


def find_adam_state(opt_state):
    """Locate the Adam moments (count, mu, nu) inside an optax chain
    state — typed (ScaleByAdamState) or a raw orbax dict restore.
    Returns None if the chain carries no Adam transform."""
    found = []

    def visit(node):
        if node is None or isinstance(node, (jnp.ndarray, np.ndarray)):
            return
        mu, nu, count = _leaf(node, "mu"), _leaf(node, "nu"), _leaf(node, "count")
        if mu is not None and nu is not None and count is not None:
            found.append((count, mu, nu))
            return
        children = node.values() if isinstance(node, dict) else (
            node if isinstance(node, (tuple, list)) else ()
        )
        for c in children:
            visit(c)

    visit(opt_state)
    return found[0] if found else None


def export_pth_tar(
    variables: Dict[str, Any],
    path: str,
    bank: Optional[BankState] = None,
    epoch: int = 0,
    opt_state=None,
    opt_hparams: Optional[Dict[str, Any]] = None,
):
    """Write a reference-compatible checkpoint (model keys prefixed
    `module.` like the DDP-wrapped reference save; dict schema
    utils/main_utils.py:271-287: {'epoch','model','optimizer',
    'train_criterion'}).

    `opt_state` (an optax chain state or a raw orbax restore of one)
    exports the Adam moments as a torch `optimizer.state_dict()` —
    exp_avg/exp_avg_sq per parameter, indexed in the reference
    `model.parameters()` registration order — so a framework run resumes
    in the reference with intact moments. `opt_hparams` fills the torch
    param_group (lr/betas/eps/weight_decay)."""
    import torch

    torch_sd = flax_to_torch_state(variables)
    model_sd = {
        f"module.{k}": torch.from_numpy(np.array(v))
        for k, v in torch_sd.items()
    }
    ckp: Dict[str, Any] = {"epoch": epoch, "model": model_sd}
    if opt_state is not None:
        adam = find_adam_state(opt_state)
        if adam is None:
            raise ValueError("opt_state carries no Adam moments to export")
        count, mu, nu = adam
        # route the moment trees through the SAME flax->torch mapping as
        # the params (kernel transposes included), then index in
        # registration order
        mu_t = flax_to_torch_state({"params": mu})
        nu_t = flax_to_torch_state({"params": nu})
        order = reference_parameter_order(torch_sd.keys())
        hp = dict(opt_hparams or {})
        step_t = torch.tensor(float(np.asarray(count)))
        ckp["optimizer"] = {
            "state": {
                i: {
                    "step": step_t.clone(),
                    "exp_avg": torch.from_numpy(np.array(mu_t[k])),
                    "exp_avg_sq": torch.from_numpy(np.array(nu_t[k])),
                }
                for i, k in enumerate(order)
            },
            "param_groups": [{
                "lr": float(hp.get("lr", 1e-4)),
                "betas": tuple(hp.get("betas", (0.9, 0.999))),
                "eps": float(hp.get("eps", 1e-8)),
                "weight_decay": float(hp.get("weight_decay", 0.0)),
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "params": list(range(len(order))),
            }],
        }
    if bank is not None:
        ckp["train_criterion"] = {
            "nce_average.view1_mem": torch.from_numpy(np.array(bank.view1_mem)),
            "nce_average.view2_mem": torch.from_numpy(np.array(bank.view2_mem)),
            "criterion.avg_exp_score": torch.tensor(float(bank.z)),
        }
    torch.save(ckp, path)


def import_optimizer_pth_tar(path: str, params, optimizer):
    """Reference checkpoint `optimizer` section -> optax chain state with
    the Adam moments restored (inverse of export_pth_tar's optimizer
    export; reference resume: utils/main_utils.py:290-300). `optimizer`
    is the optax transform the state must fit; moments for parameters
    the checkpoint lacks stay zero."""
    import torch

    ckp = torch.load(path, map_location="cpu", weights_only=False)
    if "optimizer" not in ckp:
        raise KeyError(f"{path} has no optimizer section")
    opt_sd = ckp["optimizer"]
    order = reference_parameter_order(
        flax_to_torch_state({"params": params}).keys()
    )

    def build_moment(field):
        tree = jax.tree.map(lambda p: np.zeros_like(np.asarray(p)), params)
        for i, key in enumerate(order):
            st = opt_sd["state"].get(i, opt_sd["state"].get(str(i)))
            if st is None:
                continue
            arr = np.asarray(st[field])
            mapped = _torch_key_to_flax(key)
            if mapped is None:
                continue
            mpath, leaf, _ = mapped
            if leaf == "kernel":
                arr = _to_flax_kernel(arr)
            node = tree
            for p in mpath:
                node = node[p]
            node[leaf] = arr
        return jax.tree.map(jnp.asarray, tree)

    steps = [np.asarray(s["step"]) for s in opt_sd["state"].values()]
    count = jnp.asarray(int(steps[0]) if steps else 0, jnp.int32)
    mu = build_moment("exp_avg")
    nu = build_moment("exp_avg_sq")

    import optax

    opt_state = optimizer.init(params)

    def replace_adam(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=count, mu=mu, nu=nu)
        if isinstance(node, tuple):
            kids = [replace_adam(c) for c in node]
            # namedtuple states reconstruct by fields; the chain itself
            # is a plain tuple
            if hasattr(node, "_fields"):
                return type(node)(*kids)
            return tuple(kids)
        return node

    new_state = replace_adam(opt_state)
    if find_adam_state(new_state) is None:
        raise ValueError("optimizer has no Adam transform to restore into")
    return new_state


# ---------------------------------------------------------------------------
# Orbax-native manager
# ---------------------------------------------------------------------------

class CheckpointManager:
    """Orbax checkpointing of the full TrainState
    (reference analogue: utils/main_utils.py:265-323).

    Milestone steps (the reference's permanently-kept
    `checkpoint-ep{N}.pth.tar` copies, main-avid.py:126-127 +
    utils/main_utils.py:271-287) are exempted from max_to_keep garbage
    collection via orbax's should_keep_fn; the set is persisted in
    `milestones.txt` so it survives restarts."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._milestones_path = os.path.join(self.directory, "milestones.txt")
        self._milestones = set()
        if os.path.isfile(self._milestones_path):
            with open(self._milestones_path) as f:
                self._milestones = {int(s) for s in f.read().split()}
        # Distinct barrier namespace PER MANAGER: orbax's cross-process
        # sync barriers are keyed by (prefix, operation, counter); two
        # managers with the same (default-empty) prefix issuing concurrent
        # async saves collide with FAILED_PRECONDITION "Barrier ... is
        # already ongoing" under multi-process execution (the eval loop
        # runs three managers — orbax / orbax_best / orbax_warmup — and
        # saves to two of them back-to-back each epoch). Derive the
        # prefix from the directory so every process computes the same
        # prefix for the same manager and different ones for different
        # managers.
        prefix = hashlib.sha1(self.directory.encode()).hexdigest()[:12]
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                should_keep_fn=lambda step: step in self._milestones,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix=f"ckpt_{prefix}"
                ),
            ),
        )
        # steps with an async write possibly still in flight (all_steps()
        # only lists committed ones)
        self._requested_steps: set = set()

    def save(
        self, step: int, state, force: bool = False, milestone: bool = False,
        wait: bool = False,
    ) -> bool:
        """ASYNC by default: orbax blocks only until the device->host
        copy completes (so donated state buffers may be reused by the
        next train step immediately), then serializes to disk in a
        background thread — a mid-epoch preemption-safe save no longer
        stalls the train loop for the full write. `wait=True` (or
        wait_until_finished()) blocks until the bytes are durable."""
        import orbax.checkpoint as ocp

        if milestone:
            self._milestones.add(int(step))
            # rank-0 only, atomically: every process calls save() under
            # multi-host orbax over a shared filesystem, and a concurrent
            # truncate+write could tear the milestone set
            if jax.process_index() == 0:
                tmp = self._milestones_path + ".tmp"
                with open(tmp, "w") as f:
                    f.write("\n".join(str(s) for s in sorted(self._milestones)))
                os.replace(tmp, self._milestones_path)
        if (int(step) in self._requested_steps
                or int(step) in set(self._mgr.all_steps())):
            # already written (or an async write is in flight) — e.g. a
            # save_freq_steps save landing exactly on the epoch boundary.
            # Re-saving raises StepAlreadyExistsError (orbax raises
            # regardless of force); the milestone flag is recorded above
            # and retention consults the live set, so the existing
            # checkpoint is kept.
            if wait:
                self._mgr.wait_until_finished()
            return True
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force or milestone
        )
        self._requested_steps.add(int(step))
        if wait:
            self._mgr.wait_until_finished()
        return saved

    def wait_until_finished(self) -> None:
        """Block until every in-flight async save is durable on disk —
        call before process exit or before handing the directory to a
        reader."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        self._mgr.wait_until_finished()  # a pending write may be `step`
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_raw(self, step: Optional[int] = None):
        """Restore without a template (raw nested dict) — for extracting
        sub-trees like a pretrained backbone's params."""
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step)
