from image_matching_tpu.parallel.mesh import (
    make_mesh,
    make_data_mesh,
    data_sharding,
    replicate,
    shard_batch,
)
from image_matching_tpu.parallel.pipeline import (
    make_pipelined_superglue,
    stack_gnn_params,
)
from image_matching_tpu.parallel.sharding import (
    superglue_param_sharding,
    apply_param_sharding,
)

__all__ = [
    "make_pipelined_superglue",
    "stack_gnn_params",
    "make_mesh",
    "make_data_mesh",
    "data_sharding",
    "replicate",
    "shard_batch",
    "superglue_param_sharding",
    "apply_param_sharding",
]
