from phenaki_tpu.parallel.distributed import (
    init_distributed,
    is_main_process,
    process_count,
    process_index,
)
from phenaki_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    param_partition_spec,
    place_like,
    replicate,
    shard_batch,
    shard_like_params,
    shard_params,
)
from phenaki_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_transformer_apply,
)
from phenaki_tpu.parallel.ring_attention import (
    ring_qk_norm_attention,
    sequence_sharded_attention,
)

__all__ = [
    "init_distributed",
    "is_main_process",
    "process_count",
    "process_index",
    "make_mesh",
    "make_multislice_mesh",
    "param_partition_spec",
    "place_like",
    "replicate",
    "shard_batch",
    "shard_like_params",
    "shard_params",
    "make_pipeline_mesh",
    "pipeline_transformer_apply",
    "ring_qk_norm_attention",
    "sequence_sharded_attention",
]
