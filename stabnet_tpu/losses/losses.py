"""StabNet loss library.

All loss terms of the reference training objective, as pure functions over
arrays (reference: s_net_bundle_nobm.py:139-230,301-359 and
train_bundle_nobm.py:115-126).  Gates (`use_black`, `use_temp`,
`use_theta_only`) are traced scalars so one compiled train step serves the
whole phase-in schedule.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from stabnet_tpu.config import StabNetConfig


def id_loss(theta: jax.Array) -> jax.Array:
    """Identity prior: mean |theta| (reference: s_net_bundle_nobm.py:262-263).

    Note the reference multiplies by id_mul here AND by theta_mul in the total;
    we keep both factors in `total_loss` for clarity.
    """
    return jnp.mean(jnp.abs(theta))


def black_pos_loss(pts1: jax.Array, do_crop_rate: float) -> jax.Array:
    """Mean squared hinge on mesh cell corners beyond +/- 1/do_crop_rate.

    pts1: (B, grid_h, grid_w, 8).  Reference: s_net_bundle_nobm.py:139-146,
    312-317 (square applied before the gate, mean over everything).
    """
    bound = 1.0 / do_crop_rate
    over = jnp.maximum(pts1 - bound, 0.0)
    under = jnp.maximum(-bound - pts1, 0.0)
    err = over + under
    return jnp.mean(err * err)


def distortion_loss(pts1: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    """Right-angle rigidity over 8 triangle orientations per mesh cell.

    pts1: (B, grid_h, grid_w, 8) in [x_tl x_tr x_bl x_br | y_tl ...] layout.
    Reference: s_net_bundle_nobm.py:148-181.
    """
    h = 2.0 / grid_h
    w = 2.0 / grid_w
    pts = pts1.reshape(-1, 2, 4)               # (B*cells, xy, corner)
    p = [pts[:, :, k] for k in range(4)]       # each (N, 2) = (x, y)

    def rotate(v, k, clock):
        # R @ v for R = [[0, -k], [k, 0]] (ccw) or [[0, k], [-k, 0]] (cw).
        x, y = v[:, 0], v[:, 1]
        if not clock:
            return jnp.stack([-k * y, k * x], axis=1)
        return jnp.stack([k * y, -k * x], axis=1)

    def term(p0, p1, p2, clock, hw):
        k = (h / w) if hw == 0 else (w / h)
        d = jnp.abs(rotate(p1 - p0, k, clock) - (p2 - p1))
        return d * d

    loss = (
        term(p[0], p[1], p[3], 0, 0)
        + term(p[1], p[3], p[2], 0, 1)
        + term(p[3], p[2], p[0], 0, 0)
        + term(p[2], p[0], p[1], 0, 1)
        + term(p[1], p[0], p[2], 1, 0)
        + term(p[0], p[2], p[3], 1, 1)
        + term(p[2], p[3], p[1], 1, 0)
        + term(p[3], p[1], p[0], 1, 1)
    )
    return jnp.mean(loss) / 8.0


def consistency_loss(mesh: jax.Array) -> jax.Array:
    """Second-difference mesh smoothness (reference: s_net_bundle_nobm.py:183-210).

    mesh: (B, grid_h+1, grid_w+1, 2).  The reference enumerates each interior
    vertex triple twice (forward + backward); we reproduce that weighting by
    concatenating both directional difference stacks.
    """
    # 2*m[i-1] - m[i] - m[i-2] for i in [2, gh]; identical set as the forward
    # enumeration 2*m[i+1] - m[i] - m[i+2] for i in [0, gh-2].
    dv = 2.0 * mesh[:, 1:-1, :, :] - mesh[:, 2:, :, :] - mesh[:, :-2, :, :]
    dh = 2.0 * mesh[:, :, 1:-1, :] - mesh[:, :, 2:, :] - mesh[:, :, :-2, :]
    errs = [dv, dv, dh, dh]   # each triple counted twice, as in the reference
    flat = jnp.concatenate([jnp.abs(e).reshape(e.shape[0], -1) for e in errs], axis=1)
    return jnp.mean(flat * flat)


def warp_pts(pts: jax.Array, x_map: jax.Array, y_map: jax.Array) -> jax.Array:
    """Gather the dense sampling map at (rounded) match coordinates.

    Args:
      pts: (B, N, 2) NDC point coordinates (x, y).
      x_map, y_map: (B, H, W) dense maps.

    Returns:
      (B, N, 2) map values at the points.

    Reference: s_net_bundle_nobm.py:215-230 (round + flat gather semantics).
    """
    B, H, W = x_map.shape
    x = jnp.clip((pts[..., 0] + 1.0) / 2.0 * W, 0, W - 1)
    x = jnp.round(x).astype(jnp.int32)
    y = jnp.clip((pts[..., 1] + 1.0) / 2.0 * H, 0, H - 1)
    y = jnp.round(y).astype(jnp.int32)
    idx = x + y * W                                       # (B, N)
    flow = jnp.stack([x_map, y_map], axis=-1).reshape(B, H * W, 2)
    return jnp.take_along_axis(flow, idx[..., None], axis=1)


def feature_loss(matches: jax.Array, match_mask: jax.Array,
                 x_map: jax.Array, y_map: jax.Array) -> jax.Array:
    """Feature-match reprojection loss.

    For each SIFT match (stable point, unstable point), the dense map is read
    at the stable location; the sampled source coordinate should equal the
    matched unstable location.  Masked mean over matches, mean over batch.

    Args:
      matches: (B, N, 4) rows [x_stable, y_stable, x_unstable, y_unstable].
      match_mask: (B, N) 1.0 for valid matches.

    Reference: s_net_bundle_nobm.py:335-343.
    """
    stable_pts = matches[..., :2]
    unstable_pts = matches[..., 2:]
    warped = warp_pts(stable_pts, x_map, y_map)
    per_match = jnp.sum(jnp.abs(warped - unstable_pts), axis=2)     # (B, N)
    m = match_mask.astype(per_match.dtype)
    per_ex = jnp.sum(per_match * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.mean(per_ex)


def masked_mse(err: jax.Array, keep: jax.Array) -> jax.Array:
    """Sum of squared masked error normalized per-sample by kept area.

    err, keep: (B, H, W, 1).  Reference: s_net_bundle_nobm.py:347-352.
    """
    e = err * keep
    num = jnp.sum(e * e, axis=(1, 2, 3))
    den = jnp.sum(keep, axis=(1, 2, 3)) + 1e-8
    return jnp.mean(num / den)


def img_loss(output: jax.Array, y: jax.Array, black_pix: jax.Array) -> jax.Array:
    """Pixel alignment to the ground-truth stable frame, black pixels excluded."""
    keep = (1.0 - black_pix)[..., None]
    return masked_mse(output - y, keep)


def temporal_loss(out1: jax.Array, black1: jax.Array,
                  out2_warped: jax.Array, noblack2_warped: jax.Array) -> jax.Array:
    """Temporal consistency between adjacent outputs after flow warping.

    `out2_warped` is Siamese output #2 resampled by the optical flow between
    the two stable frames; `noblack2_warped` its resampled validity.
    Reference: train_bundle_nobm.py:115-126.
    """
    keep = ((1.0 - black1)[..., None]) * noblack2_warped
    return masked_mse(out1 - out2_warped, keep)


def l2_regularization(params, weight_decay: float, head_weight_decay: float) -> jax.Array:
    """Explicit L2 penalty over conv/dense kernels.

    Replaces TF's graph-collection REGULARIZATION_LOSSES: slim's resnet arg
    scope regularizes conv kernels at `weight_decay` and the reference
    `output_layer` at FLAGS.weight_decay (reference: resnet.py:23-41,
    s_net_bundle_nobm.py:324-325).
    """

    def is_kernel(path) -> bool:
        return path[-1].key == "kernel"

    def head_scale(path) -> float:
        return head_weight_decay if any(
            getattr(p, "key", None) == "out" for p in path
        ) else weight_decay

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in leaves:
        if is_kernel(path):
            total = total + head_scale(path) * jnp.sum(
                jnp.square(leaf.astype(jnp.float32))
            )
    return total * 0.5


def total_loss(terms: Dict[str, jax.Array], cfg: StabNetConfig,
               use_black: jax.Array, use_theta_only: jax.Array) -> jax.Array:
    """Combine weighted loss terms with gates.

    `terms` holds UNWEIGHTED losses; weighting mirrors
    s_net_bundle_nobm.py:357-359.
    """
    theta_term = terms["id"] * cfg.id_mul * cfg.theta_mul
    grid_theta_term = terms["id"] * cfg.id_mul * cfg.grid_theta_mul
    gated = (
        terms["img"] * cfg.img_mul
        + terms["regu"] * cfg.regu_mul
        + terms["black"] * cfg.black_mul * use_black
        + terms["distortion"] * cfg.distortion_mul
        + terms["consistency"] * cfg.consistency_mul
        + terms["feature"] * cfg.feature_mul
    )
    return theta_term + grid_theta_term + (1.0 - use_theta_only) * gated
