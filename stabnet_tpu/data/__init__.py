"""Data layer: records, device-side augmentation, async input pipeline."""

from stabnet_tpu.data.augment import (
    AugParams,
    add_history_masks,
    augment_batch,
    augment_example,
    draw_params,
    prepare_raw,
    warp_flow,
    warp_img,
    warp_points,
)
from stabnet_tpu.data.pipeline import InputPipeline, batch_iterator, prefetch
from stabnet_tpu.data.records import (
    iterate_examples,
    list_shards,
    read_shard,
    write_shards,
    write_synthetic_dataset,
)
from stabnet_tpu.data.synthetic import make_raw_batch, make_raw_example, make_video

__all__ = [
    "AugParams",
    "InputPipeline",
    "add_history_masks",
    "augment_batch",
    "augment_example",
    "batch_iterator",
    "draw_params",
    "prepare_raw",
    "iterate_examples",
    "list_shards",
    "make_raw_batch",
    "make_raw_example",
    "make_video",
    "prefetch",
    "read_shard",
    "warp_flow",
    "warp_img",
    "warp_points",
    "write_shards",
    "write_synthetic_dataset",
]
