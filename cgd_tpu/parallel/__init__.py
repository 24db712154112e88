from cgd_tpu.parallel.mesh import (  # noqa: F401
    cutout_sharding,
    make_mesh,
    shard_params_replicated,
)
