from xclim_tpu.parallel.sharding import (  # noqa: F401
    shard_space,
    space_mesh,
    sharded_jit,
)
