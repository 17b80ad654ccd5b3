"""Multi-host input feeding: stream sharding, the single-process degenerate
case, and a REAL 2-process jax.distributed run (slow tier)."""

import os

import numpy as np
import jax
import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    """REAL multi-process execution: 2 processes x 4 virtual CPU devices
    rendezvous via jax.distributed.initialize, feed MultiHostPipeline, and
    run sharded train steps over the 8-device global mesh.  The per-step
    losses must match a single-process run that assembles the IDENTICAL
    global batches (proc-0 residue examples first, then proc-1's — the
    make_array_from_process_local_data layout) on the conftest's 8-device
    mesh.  This executes the non-degenerate branch of
    initialize_distributed and the cross-process global-batch contract.
    """
    import json
    import socket
    import subprocess
    import sys

    steps, gbs, nproc = 2, 8, 2
    d = str(tmp_path / "data")
    cfg = CFG.replace(batch_size=gbs)
    write_synthetic_dataset(d, cfg, 16, seed=1, shard_size=8)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, d, coord, str(nproc), str(pid),
             str(steps), str(gbs)],
            env=env, cwd=root, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    result_lines = [ln for out in outs for ln in out.splitlines()
                    if ln.startswith("RESULT ")]
    assert len(result_lines) == 1, outs  # printed by process 0 only
    mp_losses = json.loads(result_lines[0][len("RESULT "):])["losses"]
    assert len(mp_losses) == steps and all(np.isfinite(mp_losses))

    # Single-process reference with the multi-process batch layout.
    from stabnet_tpu.data import augment
    from stabnet_tpu.data.pipeline import (batch_iterator, ensure_flow,
                                           make_aug_fn)
    from stabnet_tpu.parallel.multihost import form_global_batch

    mesh = data_mesh()
    aug_jit = jax.jit(make_aug_fn(cfg, False), static_argnums=(2,))
    its = [batch_iterator(d, cfg, batch_size=gbs // nproc, shuffle=True,
                          seed=0, shard=(i, nproc)) for i in range(nproc)]
    model = make_model(cfg)
    from stabnet_tpu.train.state import create_train_state
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), mesh=mesh)
    step = make_train_step(model, cfg, mesh=mesh)
    key = jax.random.fold_in(jax.random.PRNGKey(0), 0)
    ref_losses = []
    for _ in range(steps):
        locals_ = [next(it) for it in its]
        merged = {k: np.concatenate([loc[k] for loc in locals_])
                  for k in locals_[0]}
        merged = ensure_flow(merged, cfg, False)
        merged = augment.prepare_raw(merged)
        batch = form_global_batch(merged, mesh, cfg.mesh_data_axis)
        key, sub = jax.random.split(key)
        batch = aug_jit(sub, batch, True)
        state, aux = step(state, batch)
        ref_losses.append(float(aux["total"]))

    # The 2-process compile partitions the gradient all-reduce differently
    # from the single-process 8-device one, so f32 reduction order differs;
    # one Adam update (rsqrt of near-zero second moments) amplifies that to
    # ~4e-3 relative on this tiny loss (observed max 3.9e-3).  Identical
    # batches + the same math leave only that reduction-order noise.
    np.testing.assert_allclose(mp_losses, ref_losses, rtol=2e-2, atol=1e-7)
