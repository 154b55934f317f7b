from vision_mtl_tpu.tracking.tb import MetricsLogger  # noqa: F401
from vision_mtl_tpu.tracking.comet import (  # noqa: F401
    create_tracking_exp,
    log_params_to_exp,
)
