"""Multi-host input feeding (single-process degenerate + stream sharding)."""

import numpy as np
import jax

from stabnet_tpu.config import get_config
from stabnet_tpu.data.records import iterate_examples, write_synthetic_dataset
from stabnet_tpu.models import make_model
from stabnet_tpu.parallel import (
    MultiHostPipeline,
    data_mesh,
    form_global_batch,
    local_batch_size,
)
from stabnet_tpu.train.state import create_train_state
from stabnet_tpu.train.train import make_train_step

CFG = get_config("tiny")


def test_stream_shards_partition_exactly(tmp_path):
    """The residue-class shards are disjoint and their union is the stream."""
    d = str(tmp_path / "data")
    write_synthetic_dataset(d, CFG, 12, seed=0, shard_size=5)

    def stream_ids(shard):
        out = []
        for ex in iterate_examples(d, epochs=1, shuffle=True, seed=3,
                                   shard=shard):
            # fingerprint an example by a few stable bytes
            out.append(ex["stable"][:2, :2, 0].tobytes())
        return out

    full = stream_ids(None)
    parts = [stream_ids((i, 4)) for i in range(4)]
    assert sum(len(p) for p in parts) == len(full) == 12
    # disjoint + exact interleave: part i holds positions i, i+4, ...
    for i, p in enumerate(parts):
        assert p == full[i::4]


def test_multihost_pipeline_single_process_feeds_train_step(tmp_path):
    """Degenerate 1-process case on the virtual 8-device mesh: batches come
    out globally sharded and drive a sharded train step directly."""
    d = str(tmp_path / "data")
    cfg = CFG.replace(batch_size=8)
    write_synthetic_dataset(d, cfg, 16, seed=1, shard_size=8)

    mesh = data_mesh()
    pipe = MultiHostPipeline(d, cfg, mesh, seed=0)
    batch = next(pipe)
    leaf = batch["x1"]
    assert leaf.shape[0] == cfg.batch_size
    assert leaf.sharding.mesh == mesh

    model = make_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, mesh=mesh)
    state, aux = step(state, batch)
    assert np.isfinite(float(aux["total"]))


def test_local_batch_size_and_form_global_batch():
    assert local_batch_size(8) == 8  # single process
    mesh = data_mesh()
    local = {"a": np.arange(16, dtype=np.float32).reshape(8, 2)}
    g = form_global_batch(local, mesh)
    assert g["a"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(g["a"]), local["a"])
