from avid_cma_tpu.criterions.avid import (  # noqa: F401
    AVIDConfig,
    BankState,
    avid_forward,
    init_bank_state,
    l2_normalize,
    update_banks,
)
from avid_cma_tpu.criterions.avid_cma import (  # noqa: F401
    AVIDCMAConfig,
    CMAState,
    cma_forward,
    cma_state_from_bank,
    should_resample,
)
from avid_cma_tpu.criterions.mining import (  # noqa: F401
    mine_positives,
    mine_positives_sharded,
)
from avid_cma_tpu.criterions.nce import nce_loss, resolve_partition  # noqa: F401
from avid_cma_tpu.registry import CRITERIONS

CRITERIONS.register("AVID")(AVIDConfig)
CRITERIONS.register("AVID_CMA")(AVIDCMAConfig)
