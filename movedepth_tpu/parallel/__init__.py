from movedepth_tpu.parallel.mesh import (
    make_mesh,
    activate_mesh,
    constrain,
    shard_batch,
    replicate,
)
