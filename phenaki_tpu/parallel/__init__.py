from phenaki_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    param_partition_spec,
    shard_params,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "param_partition_spec",
    "shard_params",
]
