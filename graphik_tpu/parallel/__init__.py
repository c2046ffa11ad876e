from graphik_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    solve_ik_sharded,
    solve_ik_restarts,
    summarize,
)
