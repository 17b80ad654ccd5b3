"""Device-mesh / sharding layer (new capability; reference is single-GPU)."""

from stabnet_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    replicated,
    shard_batch,
)
from stabnet_tpu.parallel.multihost import (
    MultiHostPipeline,
    form_global_batch,
    initialize_distributed,
    local_batch_size,
)

__all__ = [
    "MultiHostPipeline",
    "batch_sharding",
    "data_mesh",
    "form_global_batch",
    "initialize_distributed",
    "local_batch_size",
    "replicated",
    "shard_batch",
]
