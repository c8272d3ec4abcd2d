from mnasnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    label_sharding,
    replicated,
    shard_batch,
    replicate_state,
)
