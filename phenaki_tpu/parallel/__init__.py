from phenaki_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    param_partition_spec,
    shard_params,
)
from phenaki_tpu.parallel.ring_attention import (
    ring_qk_norm_attention,
    sequence_sharded_attention,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "param_partition_spec",
    "shard_params",
    "ring_qk_norm_attention",
    "sequence_sharded_attention",
]
