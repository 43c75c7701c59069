from obvi_slam_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    replicate,
    shard_plan,
    shard_problem,
    shard_tables,
    shard_weights,
    sharded_compute_step,
)
from obvi_slam_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    initialize as initialize_distributed,
    shard_sessions,
)
