"""Training record format: sharded .npz example archives + index.

The reference stores examples as TFRecords holding frame PATHS, a sparse flow
map, and padded feature matches, decoding 16 JPEGs per example at read time
(get_data_mini_after.py:158-226).  The TPU-native format materializes the raw
example tensors into compressed .npz shards so read-time work is a single
decompress + slice — there is one host core feeding the chip, so per-example
JPEG decode trees are the wrong trade.

Shard layout: `shard-NNNNN.npz` with stacked arrays for `SHARD_KEYS` plus an
`n` count; `list.txt` naming shards (mirrors the reference's list.txt driver,
get_data_mini_after.py:158-163).

A compatibility reader for the reference's original TFRecord schema lives in
`stabnet_tpu.compat.tfrecord` (gated on TensorFlow availability).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from stabnet_tpu.config import StabNetConfig

SHARD_KEYS = ("stable", "unstable", "flow", "matches1", "mask1", "matches2", "mask2")


def write_shards(path: str, examples: Sequence[Dict[str, np.ndarray]],
                 shard_size: int = 64) -> List[str]:
    os.makedirs(path, exist_ok=True)
    # `flow` is optional: shards without it train with on-device TV-L1 flow
    # (`train --compute-flow`; stabnet_tpu.ops.flow).
    keys = [k for k in SHARD_KEYS if k in examples[0]]
    names = []
    for s in range(0, len(examples), shard_size):
        chunk = examples[s : s + shard_size]
        arrays = {k: np.stack([e[k] for e in chunk]) for k in keys}
        name = f"shard-{s // shard_size:05d}.npz"
        np.savez_compressed(os.path.join(path, name), n=len(chunk), **arrays)
        names.append(name)
    with open(os.path.join(path, "list.txt"), "w") as f:
        f.write(" ".join(names))
    return names


def list_shards(path: str) -> List[str]:
    with open(os.path.join(path, "list.txt")) as f:
        return [os.path.join(path, n.strip()) for n in f.read().split() if n.strip()]


def read_shard(shard_path: str) -> Dict[str, np.ndarray]:
    with np.load(shard_path) as z:
        return {k: z[k] for k in SHARD_KEYS if k in z}


def iterate_examples(path: str, epochs: int = 1, shuffle: bool = True,
                     seed: int = 0,
                     shard: Optional[Tuple[int, int]] = None
                     ) -> Iterator[Dict[str, np.ndarray]]:
    """Stream single raw examples across shards (shuffled per epoch).

    `shard=(index, count)` yields the disjoint 1/count subset of the stream
    with global position == index (mod count) — multi-host input feeding:
    every host walks the SAME shuffled order (same seed on all hosts) and
    keeps only its residue class, so the union is exact and disjoint.
    """
    shards = list_shards(path)
    rng = np.random.RandomState(seed)
    pos = 0
    for _ in range(epochs):
        order = rng.permutation(len(shards)) if shuffle else np.arange(len(shards))
        for si in order:
            data = read_shard(shards[si])
            n = data["stable"].shape[0]
            idx = rng.permutation(n) if shuffle else np.arange(n)
            for i in idx:
                if shard is None or pos % shard[1] == shard[0]:
                    yield {k: v[i] for k, v in data.items()}
                pos += 1


def write_synthetic_dataset(path: str, cfg: StabNetConfig, num_examples: int,
                            seed: int = 0, shard_size: int = 64) -> List[str]:
    """Materialize a synthetic dataset (tests / smoke training)."""
    from stabnet_tpu.data.synthetic import make_raw_example

    examples = [make_raw_example(cfg, seed=seed + i) for i in range(num_examples)]
    return write_shards(path, examples, shard_size=shard_size)
