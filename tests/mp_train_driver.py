"""Shared driver for the multi-process train-step equivalence test.

Runs K production fused train steps (make_fused_train_step: device
preprocessing traced into the jit + model + NCE criterion with its
all_gather/psum collectives + optimizer + bank EMA scatter) on a
deterministic synthetic batch stream over whatever mesh the caller's JAX
runtime provides. Called both by the pytest process (single-process,
4-device ground truth) and by 2-process workers (2 devices each, same
4-device global mesh) — losses/params/banks must agree: that is the
proof that the host-local -> global batch bridge
(parallel/multihost.global_batch) and the distributed state placement
(distribute_tree) compute the same program the single-process path does.

The MODEL is a deliberately BN-free tiny conv net: the production
R(2+1)D backbone carries ~27 BatchNorms whose 2-sample per-device batch
stats amplify the ~1e-6 deterministic rounding difference between any
two XLA CPU compilations into ~1e-2 embedding differences, which the
NCE partition sums (exp(s/T), T=0.07) then blow up into ~20% Z offsets
— measured across two SINGLE-process device counts, i.e. inherent to
the architecture at test shapes, nothing to do with multi-process
execution. A stable model keeps the noise floor ~1e-5 so the
equivalence assertion actually means something; the full production
model runs under 2 processes in the run_pretraining smoke test instead.

Capability reference: multi-node DDP training, main-avid.py:66-78 +
utils/main_utils.py:18-31.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

# test-sized geometry (mirrors tests/test_loops.pretrain_cfg)
NUM_DATA = 16
CROP = 32
FRAMES_T = 2
RAW_HW = 48
AUDIO_LEN = 12000  # 0.5 s @ 24 kHz
EMB_DIM = 32


def make_raw(step: int, n: int) -> Dict[str, np.ndarray]:
    """Deterministic global raw batch for `step` (loader output format)."""
    rng = np.random.RandomState(1000 + step)
    return {
        "frames": rng.randint(
            0, 256, size=(n, FRAMES_T, RAW_HW, RAW_HW, 3), dtype=np.uint8
        ),
        "audio": (rng.randn(n, AUDIO_LEN) * 0.1).astype(np.float32),
        "index": rng.permutation(NUM_DATA)[:n].astype(np.int32),
    }


def _make_model():
    import flax.linen as nn

    class TinyAV(nn.Module):
        """BN-free A/V embedder with the av_wrapper call signature."""

        dim: int = EMB_DIM

        @nn.compact
        def __call__(self, video, audio, train: bool = False):
            v = nn.Conv(8, (3, 3, 3), strides=(2, 2, 2))(video)
            v = nn.relu(v).mean(axis=(1, 2, 3))
            v = nn.Dense(self.dim)(v)
            a = nn.Conv(8, (3, 3), strides=(2, 2))(audio)
            a = nn.relu(a).mean(axis=(1, 2))
            a = nn.Dense(self.dim)(a)
            return v, a

    return TinyAV()


def _db_cfg():
    from avid_cma_tpu.config import from_dict

    return from_dict({
        "name": "kinetics", "backend": "synthetic",
        "synthetic_size": NUM_DATA, "batch_size": 8,
        "video_clip_duration": 0.25, "video_fps": 8.0,
        "crop_size": CROP, "audio_clip_duration": 0.5,
        "audio_fps": 24000, "spectrogram_fps": 100.0, "n_fft": 512,
    })


def run_fused_steps(n_steps: int = 3, global_bs: int = 8,
                    n_devices: int | None = None) -> Dict[str, object]:
    """Build model/state over the runtime's global mesh, run `n_steps`
    fused steps on make_raw batches, return comparable scalars."""
    import jax
    import optax

    from avid_cma_tpu.criterions import init_bank_state
    from avid_cma_tpu.criterions.avid import AVIDConfig
    from avid_cma_tpu.data.pipelines import preprocess_batch
    from avid_cma_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from avid_cma_tpu.parallel.multihost import (
        distribute_tree,
        global_batch,
        is_multiprocess,
    )
    from avid_cma_tpu.train import builders
    from avid_cma_tpu.train.step import (
        bank_state_specs,
        init_train_state,
        make_fused_train_step,
    )

    mesh = make_mesh(n_devices=n_devices)
    model = _make_model()
    crit_cfg = AVIDConfig(num_data=NUM_DATA, embedding_dim=EMB_DIM,
                          num_negatives=8, momentum=(0.5, 0.5),
                          xModal_coeff=1.0, wModal_coeff=0.0)
    # plain SGD: adaptive normalization (Adam) turns the ~1e-6 rounding
    # noise between the two compilations into sign flips; SGD keeps the
    # error growth linear so the comparison stays tight
    optimizer = optax.sgd(1e-3, momentum=0.9)
    pp_cfg = builders.build_preprocess_config(_db_cfg())

    # shape-only local sample for init (batch size independent)
    sample = {k: v[:2] for k, v in make_raw(0, 4).items()}
    sample = preprocess_batch(jax.random.key(0), sample, pp_cfg, train=True)
    state = init_train_state(jax.random.key(0), model, sample, optimizer)
    state = state.replace(bank=init_bank_state(
        jax.random.key(2), crit_cfg.num_data, crit_cfg.embedding_dim
    ))
    state = distribute_tree(
        state, mesh, bank_state_specs(state, DATA_AXIS, False)
    )

    fused = make_fused_train_step(model, crit_cfg, optimizer, mesh,
                                  pp_cfg, seed=0)
    losses: List[float] = []
    for i in range(n_steps):
        raw = make_raw(i, global_bs)
        if is_multiprocess():
            # this process's contiguous row block of the global batch
            # (mesh device order is process-major)
            per = global_bs // jax.process_count()
            lo = jax.process_index() * per
            raw = {k: v[lo:lo + per] for k, v in raw.items()}
        state, metrics = fused(state, global_batch(raw, mesh), i)
        losses.append(float(metrics["loss"]))

    param_sum = float(sum(
        float(np.abs(np.asarray(x)).sum())
        for x in jax.tree_util.tree_leaves(state.params)
    ))
    bank_sum = float(np.abs(np.asarray(state.bank.view1_mem)).sum())
    return {"losses": losses, "param_sum": param_sum, "bank_sum": bank_sum,
            "z": float(state.bank.z)}
