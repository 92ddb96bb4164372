from avid_cma_tpu.data.decode import (  # noqa: F401
    DecodeBackend,
    FFmpegCLIBackend,
    PyAVBackend,
    SyntheticBackend,
    make_backend,
)
from avid_cma_tpu.data.video_db import VideoDataset  # noqa: F401
from avid_cma_tpu.data.datasets import HMDB, UCF, AudioSet, Kinetics  # noqa: F401
from avid_cma_tpu.data.learnable import LearnableAV, LearnableAVBackend  # noqa: F401
from avid_cma_tpu.data.loader import DataLoader, ShardedBatchSampler  # noqa: F401
from avid_cma_tpu.data.pipelines import PreprocessConfig, preprocess_batch  # noqa: F401
