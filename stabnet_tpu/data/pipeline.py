"""Async host -> device input pipeline.

The reference feeds training with TF queue runners on 10 host threads, then
round-trips each batch host->device->host->device (SURVEY.md section 3.1, a
known inefficiency).  The TPU pipeline:

  host thread(s): shard read -> batch raw examples   (cheap: npz slices)
  device:         augmentation (jit/vmap, stabnet_tpu.data.augment) + train

with a small prefetch queue double-buffering host reads against device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.data import augment
from stabnet_tpu.data.records import iterate_examples


def batch_iterator(path: str, cfg: StabNetConfig, batch_size: Optional[int] = None,
                   epochs: int = 10 ** 6, shuffle: bool = True,
                   seed: int = 0, shard=None) -> Iterator[Dict[str, np.ndarray]]:
    """Yield raw host batches from a record directory.

    `shard=(index, count)` restricts to a disjoint subset of the stream
    (multi-host input feeding; see parallel.multihost).
    """
    bs = batch_size or cfg.batch_size
    buf = []
    for ex in iterate_examples(path, epochs=epochs, shuffle=shuffle, seed=seed,
                               shard=shard):
        buf.append(ex)
        if len(buf) == bs:
            yield {k: np.stack([e[k] for e in buf]) for k in buf[0]}
            buf = []


def prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue.

    Worker exceptions re-raise in the consumer (the worker also dispatches
    device work, so its failures must not degrade into a silent
    StopIteration)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(done)
        except BaseException as e:  # noqa: BLE001 - transported to consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class InputPipeline:
    """Raw record batches -> augmented device batches.

    Augmentation runs jitted on device; the returned batches are ready for
    `train_step`.  The host->device upload AND the augmentation dispatch
    happen inside the prefetch worker thread, so batch N+1's transfer (the
    dominant cost when the link is slow — ~430 ms/batch over this rig's
    tunnel) overlaps batch N's train step; the consumer receives
    already-in-flight device arrays.
    """

    def __init__(self, path: str, cfg: StabNetConfig, seed: int = 0,
                 batch_size: Optional[int] = None, prefetch_depth: int = 2,
                 shuffle: bool = True, compute_flow: bool = False,
                 flow_from_step: int = 0, start_step: int = 0):
        """`compute_flow=True` replaces (or supplies, for shards without a
        `flow` field) the record flow with on-device TV-L1 flow between the
        AUGMENTED stable pair — the estimate is consistent with the images by
        construction, where record flow must be warped alongside them
        (reference warp_flow, get_data_mini_after.py:31-48).

        `flow_from_step` skips the TV-L1 solve for batches consumed before
        that step (batch n feeds step `start_step + n` exactly, prefetch or
        not) — the temporal loss that consumes flow is gated to zero until
        `cfg.do_temp_loss_iter`, so computing it earlier is pure waste
        (~120 ms/full-size batch).

        `start_step` (the restored step when resuming) is also folded into
        the shuffle order and the augmentation key chain: a resumed run
        continues with a fresh stream rather than replaying the same
        batches/augmentations from the head — essential when a long run is
        chained as save/restore segments (scripts/train_chain.sh)."""
        self.cfg = cfg
        aug_jit = jax.jit(make_aug_fn(cfg, compute_flow),
                          static_argnames=("want_flow",))

        def device_batches():
            key = jax.random.fold_in(jax.random.PRNGKey(seed), start_step)
            for n, raw in enumerate(batch_iterator(path, cfg,
                                                   batch_size=batch_size,
                                                   shuffle=shuffle,
                                                   seed=seed + start_step)):
                raw = ensure_flow(raw, cfg, compute_flow)
                key, sub = jax.random.split(key)
                yield aug_jit(sub, augment.prepare_raw(raw),
                              want_flow=start_step + n >= flow_from_step)

        self._it = prefetch(device_batches(), depth=prefetch_depth)

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)


def make_aug_fn(cfg: StabNetConfig, compute_flow: bool):
    """The augment(+flow) closure shared by the single- and multi-host
    pipelines, so their data semantics can never drift apart.

    `want_flow` must be static under jit.  When False (temporal-loss gate
    still closed), the heavy TV-L1 solve is skipped and the flow field is
    the zero-motion sampling map, which the gated-to-zero temporal term
    consumes harmlessly (train_step always reads batch["flow"])."""

    def aug(key, raw, want_flow: bool = True):
        batch = augment.augment_batch(key, raw, cfg)
        if compute_flow:
            from stabnet_tpu.ops import flow as flow_ops

            if want_flow:
                u = flow_ops.tvl1_flow(batch["y1"][..., 0], batch["y2"][..., 0])
            else:
                u = jnp.zeros(batch["y1"][..., 0].shape + (2,), jnp.float32)
            batch["flow"] = flow_ops.flow_to_sampling(u)
        return batch

    return aug


def ensure_flow(raw, cfg: StabNetConfig, compute_flow: bool):
    """Validate the raw batch's flow field ahead of augmentation.

    With `compute_flow` the record flow (if any) is dropped so the batch
    never pays its upload/augmentation — the on-device TV-L1 result replaces
    it after augmentation (augment_example treats flow as optional)."""
    if compute_flow:
        raw.pop("flow", None)
        return raw
    if "flow" not in raw:
        raise ValueError(
            "record shards have no `flow` field; train with --compute-flow "
            "(on-device TV-L1) or bake flow into the shards"
        )
    return raw
