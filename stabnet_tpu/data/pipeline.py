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
    """Run an iterator in a background thread with a bounded queue."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            return
        yield item


class InputPipeline:
    """Raw record batches -> augmented device batches.

    Augmentation runs jitted on device; the returned batches are ready for
    `train_step`.
    """

    def __init__(self, path: str, cfg: StabNetConfig, seed: int = 0,
                 batch_size: Optional[int] = None, prefetch_depth: int = 2,
                 shuffle: bool = True):
        self.cfg = cfg
        self._aug = jax.jit(lambda key, raw: augment.augment_batch(key, raw, cfg))
        self._key = jax.random.PRNGKey(seed)
        self._raw = prefetch(
            batch_iterator(path, cfg, batch_size=batch_size, shuffle=shuffle,
                           seed=seed),
            depth=prefetch_depth,
        )

    def __iter__(self):
        return self

    def __next__(self):
        raw = next(self._raw)
        self._key, sub = jax.random.split(self._key)
        raw = augment.prepare_raw(raw)
        return self._aug(sub, raw)
