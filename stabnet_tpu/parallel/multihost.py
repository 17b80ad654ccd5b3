"""Multi-host (multi-process) input feeding over DCN.

The reference is a single TF session on one GPU (SURVEY.md section 2); this
layer is a new capability the TPU framework provides natively.  In JAX's
multi-controller SPMD model every host runs the same program, `jax.devices()`
is the GLOBAL device list, and the data mesh spans all hosts.  Input feeding
is therefore per-host:

  1. each host streams a DISJOINT residue class of the (identically
     shuffled) example stream (`records.iterate_examples(shard=...)`),
  2. builds its LOCAL slice of the global batch — global_batch /
     process_count examples — on its own chips,
  3. `jax.make_array_from_process_local_data` assembles the global
     jax.Array: metadata-only, no example bytes cross DCN,
  4. augmentation + train step run as one SPMD program over the global mesh;
     XLA emits the gradient all-reduce (ICI within a pod slice, DCN across).

On a single process all of this degrades to the ordinary pipeline: the
residue filter keeps everything, and `make_array_from_process_local_data`
is a plain sharded device_put.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.data import augment
from stabnet_tpu.data.pipeline import batch_iterator, prefetch
from stabnet_tpu.utils import get_logger

logger = get_logger()


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (idempotent, env-var driven).

    No-op for single-process runs: only initializes when explicit arguments,
    JAX_COORDINATOR_ADDRESS, or STABNET_DISTRIBUTED=1 (cluster auto-detect,
    e.g. TPU pod metadata) is present, so single-host CLI invocations never
    pay the rendezvous.

    Must run before any other JAX call: checking `jax.process_count()` (or
    touching `jax.devices()`) initializes the local XLA backend, after which
    `jax.distributed.initialize` refuses to run — so the idempotence guard
    uses `jax.distributed.is_initialized()`, which does not create backends.
    """
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    autodetect = os.environ.get("STABNET_DISTRIBUTED", "") == "1"
    if coordinator_address is None and num_processes is None and not autodetect:
        return
    if coordinator_address is None and num_processes is None:
        jax.distributed.initialize()   # cluster auto-detect (TPU pods)
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    logger.info("distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def local_batch_size(global_batch_size: int) -> int:
    """This host's share of the global batch."""
    count = jax.process_count()
    if global_batch_size % count:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{count} processes"
        )
    return global_batch_size // count


def form_global_batch(local_batch, mesh: Mesh, axis_name: str = "data"):
    """Host-local numpy batch -> globally sharded jax.Array pytree.

    Every process passes its own local slice; the result is the logical
    global batch, sharded on axis 0 over the whole mesh.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_batch,
    )


class MultiHostPipeline:
    """Per-host record reading -> globally sharded, device-augmented batches.

    Drop-in replacement for `data.InputPipeline` when training spans
    processes: yields batches already sharded over `mesh`, augmented by one
    SPMD program (each chip augments only its local examples).

    All hosts must construct it with the SAME seed AND start_step (the
    shuffled order is the cross-host contract that makes the residue classes
    disjoint; start_step comes from the shared checkpoint, so a resumed run
    agrees everywhere).  As in InputPipeline, start_step decorrelates the
    stream so restored segments don't replay the head.
    """

    def __init__(self, path: str, cfg: StabNetConfig, mesh: Mesh,
                 seed: int = 0, global_batch_size: Optional[int] = None,
                 prefetch_depth: int = 2, shuffle: bool = True,
                 compute_flow: bool = False, flow_from_step: int = 0,
                 start_step: int = 0):
        self.cfg = cfg
        self.mesh = mesh
        gbs = global_batch_size or cfg.batch_size
        self._local_bs = local_batch_size(gbs)
        self._compute_flow = compute_flow
        shard = (jax.process_index(), jax.process_count())
        sharding = NamedSharding(mesh, P(cfg.mesh_data_axis))

        # The augment(+TV-L1 flow) body is shared with data.InputPipeline
        # (make_aug_fn) so single- and multi-host training can never train on
        # subtly different data; the flow solve is batch-sharded like
        # everything else (pure per-example math), so it scales with the
        # mesh, and is skipped while the temporal-loss gate is closed
        # (`flow_from_step`, see InputPipeline).
        from stabnet_tpu.data.pipeline import ensure_flow, make_aug_fn

        # want_flow is passed positionally: pjit rejects kwargs when
        # in_shardings is given.
        aug_jit = jax.jit(make_aug_fn(cfg, compute_flow),
                          in_shardings=(None, sharding),
                          out_shardings=sharding,
                          static_argnums=(2,))

        def device_batches():
            # Upload + augmentation dispatch inside the worker thread: batch
            # N+1's host->device transfer overlaps batch N's train step
            # (same structure as data.pipeline.InputPipeline).
            key = jax.random.fold_in(jax.random.PRNGKey(seed), start_step)
            for n, local in enumerate(batch_iterator(path, cfg,
                                                     batch_size=self._local_bs,
                                                     shuffle=shuffle,
                                                     seed=seed + start_step,
                                                     shard=shard)):
                local = ensure_flow(local, cfg, compute_flow)
                local = augment.prepare_raw(local)
                batch = form_global_batch(local, mesh, cfg.mesh_data_axis)
                key, sub = jax.random.split(key)
                yield aug_jit(sub, batch, start_step + n >= flow_from_step)

        self._it: Iterator = prefetch(device_batches(), depth=prefetch_depth)

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)
