"""Device-mesh / sharding layer (new capability; reference is single-GPU)."""

from stabnet_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    replicated,
    shard_batch,
)

__all__ = ["batch_sharding", "data_mesh", "replicated", "shard_batch"]
