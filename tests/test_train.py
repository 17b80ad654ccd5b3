"""Training step smoke tests: loss decreases structure, gates, DP sharding."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.data import augment_batch, make_raw_batch, prepare_raw
from stabnet_tpu.models import make_model
from stabnet_tpu.parallel import data_mesh, shard_batch
from stabnet_tpu.train.state import create_train_state, lr_schedule
from stabnet_tpu.train.train import (
    loss_gates,
    make_eval_step,
    make_train_step,
)

CFG = get_config("tiny").replace(batch_size=2)


def make_batch(seed=0):
    raw = prepare_raw(make_raw_batch(CFG, CFG.batch_size, seed=seed))
    return augment_batch(jax.random.PRNGKey(seed), raw, CFG)


def test_gate_schedule():
    g0 = jax.tree_util.tree_map(float, loss_gates(jnp.asarray(0), CFG))
    assert g0 == {"use_theta": 1.0, "use_temp": 0.0, "use_black": 0.0,
                  "use_theta_only": 1.0}
    g = jax.tree_util.tree_map(float, loss_gates(jnp.asarray(6000), CFG))
    assert g == {"use_theta": 1.0, "use_temp": 1.0, "use_black": 1.0,
                 "use_theta_only": 0.0}


def test_lr_schedule_staircase():
    sched = lr_schedule(CFG)
    np.testing.assert_allclose(float(sched(0)), CFG.initial_learning_rate)
    np.testing.assert_allclose(float(sched(CFG.step_size - 1)),
                               CFG.initial_learning_rate)
    np.testing.assert_allclose(float(sched(CFG.step_size)),
                               CFG.initial_learning_rate * 0.1, rtol=1e-6)


@pytest.mark.slow
def test_train_step_runs_and_updates():
    model = make_model(CFG)
    state = create_train_state(model, CFG, jax.random.PRNGKey(0))
    step = make_train_step(model, CFG)
    batch = make_batch()
    new_state, aux = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(aux["total"]))
    # Parameters changed.
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # Batch stats updated.
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.batch_stats, new_state.batch_stats,
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


@pytest.mark.slow
def test_eval_step_no_mutation():
    model = make_model(CFG)
    state = create_train_state(model, CFG, jax.random.PRNGKey(0))
    ev = make_eval_step(model, CFG)
    aux = ev(state, make_batch())
    assert np.isfinite(float(aux["total"]))


@pytest.mark.slow
def test_data_parallel_train_step():
    mesh = data_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 virtual devices"
    cfg = CFG.replace(batch_size=8)
    model = make_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, mesh=mesh)
    raw = prepare_raw(make_raw_batch(cfg, 8, seed=3))
    batch = augment_batch(jax.random.PRNGKey(3), raw, cfg)
    batch = shard_batch(jax.tree_util.tree_map(np.asarray, batch), mesh)
    new_state, aux = step(state, batch)
    assert np.isfinite(float(aux["total"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_losses_pallas_path_matches_xla():
    """compute_losses with pallas_warp=True (interpret mode on CPU) must
    agree with the XLA path — covers the Pallas const-image training warp
    AND the const-maps temporal-loss warp + splat VJP wiring."""
    from stabnet_tpu.train.train import compute_losses

    model = make_model(CFG)
    state = create_train_state(model, CFG, jax.random.PRNGKey(0))
    batch = make_batch()
    gates = loss_gates(jnp.asarray(6000), CFG)   # all losses live

    def total(params, pallas):
        t, _ = compute_losses(model, params, state.batch_stats, batch, CFG,
                              gates, train=False, pallas_warp=pallas)
        return t

    tx = float(total(state.params, False))
    tp = float(total(state.params, True))
    assert abs(tx - tp) < 1e-4 * max(1.0, abs(tx))

    gx = jax.grad(lambda p: total(p, False))(state.params)
    gp = jax.grad(lambda p: total(p, True))(state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), gx, gp)
    ref = jax.tree_util.tree_map(
        lambda a: float(jnp.max(jnp.abs(a))), gx)
    # The two paths are equal in exact arithmetic; the net forward runs in
    # bf16 and the graphs fuse differently, so gradients at random init
    # (where they reach ~17 in magnitude) agree to ~2e-3 relative.
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3 * max(
        1e-3, max(jax.tree_util.tree_leaves(ref)))


def test_metrics_writer_tensorboard(tmp_path):
    """--tensorboard mirrors JSONL scalars and mosaics into TB event files."""
    import pytest

    pytest.importorskip("torch")
    tb = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    event_accumulator = tb

    from stabnet_tpu.train.loop import MetricsWriter

    w = MetricsWriter(str(tmp_path), tensorboard=True)
    assert w._tb is not None
    w.write(7, "train", {"total": 0.5, "img1": 0.25})
    w.add_image(7, "debug/mosaic", np.zeros((8, 8, 3), np.uint8))
    w.close()

    acc = event_accumulator.EventAccumulator(
        str(tmp_path / "tb"),
        size_guidance={event_accumulator.SCALARS: 0,
                       event_accumulator.IMAGES: 0})
    acc.Reload()
    scalars = {t: acc.Scalars(t) for t in acc.Tags()["scalars"]}
    assert scalars["train/total"][0].step == 7
    assert scalars["train/total"][0].value == 0.5
    assert "train/img1" in scalars
    assert "debug/mosaic" in acc.Tags()["images"]
    # JSONL is still the primary artifact.
    assert (tmp_path / "metrics.jsonl").exists()


def test_metrics_writer_no_tensorboard(tmp_path):
    """Default writer: JSONL only; add_image is a no-op."""
    from stabnet_tpu.train.loop import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.write(0, "train", {"total": 1.0})
    w.add_image(0, "debug/mosaic", np.zeros((4, 4, 3), np.uint8))
    w.close()
    assert not (tmp_path / "tb").exists()


@pytest.mark.slow
def test_one_step_run_checkpoints_and_resumes(tmp_path):
    """Even a 1-step segment ends checkpointed, and --restore continues from
    it — the contract scripts/train_chain.sh relies on."""
    import itertools

    from stabnet_tpu.train import checkpoint as ckpt
    from stabnet_tpu.train.loop import train as run_train

    cfg = CFG.replace(model_dir=str(tmp_path / "m"),
                      log_dir=str(tmp_path / "log"))
    batches = itertools.cycle([make_batch(s) for s in range(3)])

    run_train(cfg, batches, num_steps=1)
    assert ckpt.latest_step(cfg.model_dir) == 1

    state, _ = run_train(cfg, batches, restore=True, num_steps=2)
    assert int(state.step) == 2
    assert ckpt.latest_step(cfg.model_dir) == 2


def test_config_set_overrides():
    # `train --set key=value` (config.apply_overrides): typed coercion,
    # loud failure on unknown fields / malformed assignments.
    from stabnet_tpu.config import apply_overrides

    cfg = apply_overrides(
        get_config("tiny"),
        ["step_size=4000", "initial_learning_rate=1e-4", "name=endur",
         "indices=0,1,2,3"])
    assert cfg.step_size == 4000 and isinstance(cfg.step_size, int)
    assert cfg.initial_learning_rate == 1e-4
    assert cfg.name == "endur"
    assert cfg.indices == (0, 1, 2, 3)
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["no_such_field=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["step_size"])
