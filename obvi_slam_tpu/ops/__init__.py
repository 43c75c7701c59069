from obvi_slam_tpu.ops.reproj_pallas import (  # noqa: F401
    reproj_residuals_and_jac_pallas,
    pallas_supported,
)
from obvi_slam_tpu.ops.bbox_pallas import (  # noqa: F401
    bbox_residuals_and_jac_pallas,
)
