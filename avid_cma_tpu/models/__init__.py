from avid_cma_tpu.models.blocks import Basic2DBlock, BasicR2P1DBlock  # noqa: F401
from avid_cma_tpu.models.video import R2Plus1D  # noqa: F401
from avid_cma_tpu.models.audio import Conv2D  # noqa: F401
from avid_cma_tpu.models.av_wrapper import AVWrapper, Head, av_wrapper  # noqa: F401
