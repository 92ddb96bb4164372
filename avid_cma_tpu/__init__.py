"""AVID-CMA TPU: a TPU-native JAX framework for audio-visual instance
discrimination pretraining with cross-modal agreement (AVID / AVID-CMA).

Re-designed from scratch for TPU hardware (XLA / Pallas / pjit / shard_map):
  * pure-functional flax models (R(2+1)D video, 2D-conv audio encoders)
  * a single jitted SPMD train step fusing forward, NCE loss against the
    memory bank, gradients, optimizer update and the bank EMA transition
  * memory banks as explicit train-state (replicated or row-sharded)
  * CMA positive-set mining as a blocked, sharded matmul + top-k sweep
  * on-device input preprocessing (crop/flip/color-jitter, STFT spectrogram)

Capability reference: facebookresearch/AVID-CMA (cited per-module as
`reference: <file>:<lines>`), rebuilt TPU-first, not ported.
"""

__version__ = "0.1.0"

from avid_cma_tpu import config  # noqa: F401
from avid_cma_tpu import models  # noqa: F401  (populates the MODELS registry)
