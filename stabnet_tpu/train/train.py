"""Siamese training step, loss-gate schedule, and data-parallel jit.

Reference behavior being reproduced (TPU-first re-design, not a translation):

  * Siamese over two adjacent time steps with shared weights
    (train_bundle_nobm.py:107-108).  The reference builds the graph twice; we
    run ONE forward over the concatenated pair batch — identical math through
    weight sharing, and twice the matmul batch for the MXU.
  * Temporal loss between output #1 and the flow-warped output #2
    (train_bundle_nobm.py:115-126).
  * Loss-gate schedule per iteration (train_bundle_nobm.py:219-236) — computed
    from the step counter INSIDE the jitted function, so a single compiled
    step serves every phase.
  * Adam + staircase exponential LR decay (train_bundle_nobm.py:155-160).
  * BN statistics update in the training branch (s_net_bundle_nobm.py:301,
    355-356).

Data parallelism (new capability; SURVEY.md section 2): parameters replicated,
batch sharded on axis 0 over a 1-D mesh; XLA inserts the gradient all-reduce
over ICI from the sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stabnet_tpu import losses
from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.models import stabnet
from stabnet_tpu.ops import bilinear_sample
from stabnet_tpu.train.state import TrainState, make_optimizer

Batch = Dict[str, jax.Array]


def loss_gates(step: jax.Array, cfg: StabNetConfig) -> Dict[str, jax.Array]:
    """Phase-in gates as traced scalars (reference: train_bundle_nobm.py:219-236)."""
    f = jnp.float32
    # use_theta mirrors a DEAD reference placeholder: the multiplier is
    # commented out in the loss (s_net_bundle_nobm.py:310 "theta_loss =
    # id_loss") yet still fed every step (train_bundle_nobm.py:219-236).
    # Kept (and tested) purely to document the schedule; nothing consumes it.
    use_theta = jnp.where(step > cfg.no_theta_iter, f(0), f(1))
    use_theta = jnp.where(step <= cfg.do_theta_10_iter, f(10), use_theta)
    use_temp = jnp.where(step >= cfg.do_temp_loss_iter, f(1), f(0))
    use_black = jnp.where(step >= cfg.do_black_loss_iter, f(1), f(0))
    theta_only = jnp.where(step <= cfg.do_theta_only_iter, f(1), f(0))
    return {
        "use_theta": use_theta,
        "use_temp": use_temp,
        "use_black": use_black,
        "use_theta_only": theta_only,
    }


def _branch_losses(out: stabnet.StabNetOutput, y: jax.Array, matches: jax.Array,
                   mask: jax.Array, regu: jax.Array, cfg: StabNetConfig,
                   gates: Dict[str, jax.Array]) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """All per-branch loss terms (reference: s_net_bundle_nobm.py:308-359)."""
    terms = {
        "id": losses.id_loss(out.theta),
        "black": losses.black_pos_loss(out.pts1, cfg.do_crop_rate),
        "distortion": losses.distortion_loss(out.pts1, cfg.grid_h, cfg.grid_w),
        "consistency": losses.consistency_loss(out.mesh),
        "feature": losses.feature_loss(matches, mask, out.warp.x_map, out.warp.y_map),
        "img": losses.img_loss(out.warp.output, y, out.warp.black_pix),
        "regu": regu,
    }
    total = losses.total_loss(
        terms, cfg, use_black=gates["use_black"], use_theta_only=gates["use_theta_only"]
    )
    return total, terms


def compute_losses(model, params, batch_stats, batch: Batch, cfg: StabNetConfig,
                   gates: Dict[str, jax.Array], train: bool = True,
                   pallas_warp: Optional[bool] = None):
    """Full Siamese loss. Returns (total, (aux_terms, new_batch_stats))."""
    if pallas_warp is None:
        pallas_warp = jax.default_backend() in ("tpu", "axon")
    B = batch["x1"].shape[0]
    xs = jnp.concatenate([batch["x1"], batch["x2"]], axis=0)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, new_state = stabnet.forward(model, variables, xs, cfg, train=True,
                                         mutable=True, pallas_warp=pallas_warp)
        new_batch_stats = new_state["batch_stats"]
    else:
        out = stabnet.forward(model, variables, xs, cfg, train=False,
                              pallas_warp=pallas_warp)
        new_batch_stats = batch_stats

    def split(tree):
        return (
            jax.tree_util.tree_map(lambda a: a[:B], tree),
            jax.tree_util.tree_map(lambda a: a[B:], tree),
        )

    out1, out2 = split(out)

    regu = losses.l2_regularization(params, cfg.weight_decay, cfg.head_weight_decay)
    t1, terms1 = _branch_losses(out1, batch["y1"], batch["matches1"],
                                batch["mask1"], regu, cfg, gates)
    t2, terms2 = _branch_losses(out2, batch["y2"], batch["matches2"],
                                batch["mask2"], regu, cfg, gates)

    # Temporal consistency: warp branch-2 output (and its validity) by the
    # optical flow between the two stable frames, compare to branch-1 output.
    # Gradients must flow into the WARPED IMAGE (the sibling's output) while
    # the flow is data — on TPU this rides the Pallas forward + splat-VJP
    # pair (the XLA gather/scatter autodiff is serial-loop lowered, measured
    # ~120 ms of the batch-10 step); output and validity stack into one
    # 2-channel sampling pass.
    flow = batch["flow"]
    fx, fy = flow[..., 0], flow[..., 1]
    noblack2 = (1.0 - out2.warp.black_pix)[..., None]
    stacked = jnp.concatenate([out2.warp.output, noblack2], axis=-1)
    if pallas_warp:
        from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas_const_maps

        warped = bilinear_sample_pallas_const_maps(stacked, fx, fy)
    else:
        warped = bilinear_sample(stacked, fx, fy)
    out2_warped = warped[..., 0:1]
    noblack2_warped = warped[..., 1:2]
    temp = losses.temporal_loss(out1.warp.output, out1.warp.black_pix,
                                out2_warped, noblack2_warped)
    temp = temp * gates["use_temp"]

    total = t1 + t2 + temp * cfg.temp_mul
    aux = {f"{k}1": v for k, v in terms1.items()}
    aux.update({f"{k}2": v for k, v in terms2.items()})
    aux["temp"] = temp * cfg.temp_mul
    aux["total"] = total
    return total, (aux, new_batch_stats)


def train_step(model, state: TrainState, batch: Batch, cfg: StabNetConfig,
               pallas_warp: Optional[bool] = None):
    """One optimizer step. Pure function of (state, batch)."""
    gates = loss_gates(state.step, cfg)

    def loss_fn(params):
        return compute_losses(model, params, state.batch_stats, batch, cfg,
                              gates, pallas_warp=pallas_warp)

    grads, (aux, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
    tx = make_optimizer(cfg)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    new_state = TrainState(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )
    return new_state, aux


def eval_step(model, state: TrainState, batch: Batch, cfg: StabNetConfig,
              pallas_warp: Optional[bool] = None):
    """Held-out loss with frozen statistics (reference: train loop test phase,
    train_bundle_nobm.py:273-315 — the reference evaluates with the training
    graph; we evaluate with inference-mode BN, the deployed branch)."""
    gates = loss_gates(state.step, cfg)
    _, (aux, _) = compute_losses(model, state.params, state.batch_stats, batch,
                                 cfg, gates, train=False,
                                 pallas_warp=pallas_warp)
    return aux


def _mesh_pallas_default(mesh: Optional[Mesh]) -> bool:
    """Pallas kernels only when the EXECUTING devices are TPU (the default
    backend can be a TPU plugin while a test mesh targets virtual CPUs)."""
    if mesh is not None:
        return mesh.devices.flat[0].platform in ("tpu", "axon")
    return jax.default_backend() in ("tpu", "axon")


def make_train_step(model, cfg: StabNetConfig, mesh: Optional[Mesh] = None):
    """Jit the train step; with a mesh, shard the batch and replicate state."""
    step_fn = functools.partial(train_step, model, cfg=cfg,
                                pallas_warp=_mesh_pallas_default(mesh))
    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.mesh_data_axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
    )


def make_eval_step(model, cfg: StabNetConfig, mesh: Optional[Mesh] = None):
    step_fn = functools.partial(eval_step, model, cfg=cfg,
                                pallas_warp=_mesh_pallas_default(mesh))
    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.mesh_data_axis))
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=repl)
