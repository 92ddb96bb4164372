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

def load_pth_tar(path: str) -> Dict[str, Any]:
    import torch

    ckp = torch.load(path, map_location="cpu", weights_only=False)
    return {
        k: (v if not hasattr(v, "numpy") else v)
        for k, v in ckp.items()
    }


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


def export_pth_tar(
    variables: Dict[str, Any],
    path: str,
    bank: Optional[BankState] = None,
    epoch: int = 0,
):
    """Write a reference-compatible checkpoint (model keys prefixed
    `module.` like the DDP-wrapped reference save)."""
    import torch

    model_sd = {
        f"module.{k}": torch.from_numpy(np.array(v))
        for k, v in flax_to_torch_state(variables).items()
    }
    ckp: Dict[str, Any] = {"epoch": epoch, "model": model_sd}
    if bank is not None:
        ckp["train_criterion"] = {
            "nce_average.view1_mem": torch.from_numpy(np.array(bank.view1_mem)),
            "nce_average.view2_mem": torch.from_numpy(np.array(bank.view2_mem)),
            "criterion.avg_exp_score": torch.tensor(float(bank.z)),
        }
    torch.save(ckp, path)


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
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                should_keep_fn=lambda step: step in self._milestones,
            ),
        )

    def save(
        self, step: int, state, force: bool = False, milestone: bool = False
    ) -> bool:
        import orbax.checkpoint as ocp

        if milestone:
            self._milestones.add(int(step))
            with open(self._milestones_path, "w") as f:
                f.write("\n".join(str(s) for s in sorted(self._milestones)))
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force or milestone
        )
        self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_raw(self, step: Optional[int] = None):
        """Restore without a template (raw nested dict) — for extracting
        sub-trees like a pretrained backbone's params."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step)
