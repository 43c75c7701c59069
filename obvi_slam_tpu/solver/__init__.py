from obvi_slam_tpu.solver import schur  # noqa: F401
from obvi_slam_tpu.solver.schur import (  # noqa: F401
    FactorWeights,
    SchurPlan,
    build_schur_plan,
    build_schur_plan_host,
    compute_marginal_covariances,
    compute_step,
    ones_weights,
)
from obvi_slam_tpu.solver.lm import (  # noqa: F401
    LMParams,
    LMSummary,
    solve,
)
from obvi_slam_tpu.solver.lm_fused import solve_fused  # noqa: F401
