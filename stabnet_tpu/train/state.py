"""Train state and optimizer (reference: train_bundle_nobm.py:155-160)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from stabnet_tpu.config import StabNetConfig


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: StabNetConfig) -> optax.Schedule:
    """Staircase exponential decay: lr0 * decay^(floor(step/step_size)).

    Reference: train_bundle_nobm.py:156-158.
    """
    return optax.exponential_decay(
        init_value=cfg.initial_learning_rate,
        transition_steps=cfg.step_size,
        decay_rate=cfg.lr_decay_rate,
        staircase=True,
    )


def make_optimizer(cfg: StabNetConfig) -> optax.GradientTransformation:
    """Adam with the reference's defaults (train_bundle_nobm.py:159)."""
    return optax.adam(lr_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(model, cfg: StabNetConfig, rng: jax.Array,
                       mesh=None) -> TrainState:
    """Fresh TrainState; with `mesh`, placed replicated over it.

    The mesh placement matters for compile time, not just locality: the
    mesh-sharded train step returns state avals annotated with the mesh
    (`{Auto: ('data',)}`), so an initial state built WITHOUT the mesh has
    different avals and triggers a full second trace+compile on step 1
    (measured ~90 s on CPU, and the same double-compile on TPU).
    """
    from stabnet_tpu.models.stabnet import init_variables

    variables = init_variables(model, cfg, rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer(cfg).init(params)
    import jax.numpy as jnp

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    if mesh is not None:
        state = replicate_state(state, mesh)
    return state


def replicate_state(state: TrainState, mesh) -> TrainState:
    """Place every leaf replicated over `mesh` (see create_train_state)."""
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
