from colpali_tpu.models.layers import flash_mesh  # noqa: F401
from colpali_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    DEFAULT_TP_RULES,
)
