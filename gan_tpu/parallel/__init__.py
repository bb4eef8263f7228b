from gan_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicate_sharding,
    shard_params,
    param_pspecs,
    grouped_param_prefixes,
)
