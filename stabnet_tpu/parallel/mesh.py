"""Mesh construction and sharding specs for data-parallel StabNet.

The reference has no multi-device capability (single TF session, one GPU;
SURVEY.md section 2).  The TPU framework scales the natural way for a
ResNet-50-sized model: pure DATA parallelism over the ICI mesh — parameters
replicated, the batch sharded on axis 0, gradient all-reduce emitted by XLA
from the sharding annotations (the "let XLA insert collectives" recipe).

Batched offline stabilization shards independent clips over the same axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D device mesh over all (or given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch / clip axis) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch pytree with axis-0 sharding."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
