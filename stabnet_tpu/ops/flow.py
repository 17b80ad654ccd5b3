"""TPU-native TV-L1 optical flow (Zach et al. 2007; Sanchez et al., IPOL 2013).

The reference trains its temporal-consistency loss on PRECOMPUTED TV-L1 flow
baked into the DeepStab TFRecords (sparse flow decoded at
get_data_mini_after.py:210; consumed by train_bundle_nobm.py:115-126).  That
makes the dataset a hard dependency: no flow, no temporal loss.  This module
removes the dependency by estimating the same flow on device, so

  * record shards may omit the `flow` field entirely (`train --compute-flow`),
  * flow-augmented training runs on ANY video source, including the hard
    1080p categories (BASELINE stretch config), and
  * flow is computed AFTER augmentation from the augmented stable pair, so
    the image/flow consistency the reference carefully maintains through its
    `warp_flow` path (get_data_mini_after.py:31-48) holds by construction.

TPU-first design: one jittable function; the coarse-to-fine pyramid is a
static Python loop over fixed shapes, the primal-dual iterations are
`lax.fori_loop` bodies of pure batched VPU elementwise work, and the image
warps ride the Pallas MXU sampler (per-pixel gathers lower to serial loops
on TPU — the one thing this solver must not do).  No data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from stabnet_tpu.ops.resize import resize_bilinear_bhw


def _warp_fields(fields: jax.Array, x_pix: jax.Array, y_pix: jax.Array
                 ) -> jax.Array:
    """Sample (B, H, W, C) fields at pixel coords with clamp-to-edge.

    Coordinates are clipped fractionally inside the frame so both backends
    return the nearest edge pixel there (the warp library's reference
    semantics fade to zero OUTSIDE the frame, which would poison the
    residual at the borders).
    """
    B, H, W, C = fields.shape
    x = jnp.clip(x_pix, 0.0, W - 1.0 - 1e-3)
    y = jnp.clip(y_pix, 0.0, H - 1.0 - 1e-3)
    x_ndc = 2.0 * x / W - 1.0
    y_ndc = 2.0 * y / H - 1.0
    # Dispatch on the PLACEMENT platform, not the process default backend:
    # the quality-metric chain runs this under jax.default_device(cpu) in
    # TPU processes (eval/metrics.py), where the Pallas TPU kernel would
    # fail to lower ("Only interpret mode is supported on CPU backend").
    from stabnet_tpu.utils.platforms import placement_platform

    if placement_platform() in ("tpu", "axon"):
        from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas

        return bilinear_sample_pallas(fields, x_ndc, y_ndc, exact=True,
                                      strict_edge=False)
    from stabnet_tpu.ops.warp import bilinear_sample

    return bilinear_sample(fields, x_ndc, y_ndc)


def _grad_central(im: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Central-difference gradient of (B, H, W) with one-sided borders."""
    gx = jnp.concatenate(
        [im[:, :, 1:2] - im[:, :, 0:1],
         (im[:, :, 2:] - im[:, :, :-2]) * 0.5,
         im[:, :, -1:] - im[:, :, -2:-1]], axis=2)
    gy = jnp.concatenate(
        [im[:, 1:2] - im[:, 0:1],
         (im[:, 2:] - im[:, :-2]) * 0.5,
         im[:, -1:] - im[:, -2:-1]], axis=1)
    return gx, gy


def _grad_forward(u: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Forward differences of (B, H, W), zero at the far border."""
    gx = jnp.concatenate([u[:, :, 1:] - u[:, :, :-1],
                          jnp.zeros_like(u[:, :, :1])], axis=2)
    gy = jnp.concatenate([u[:, 1:] - u[:, :-1],
                          jnp.zeros_like(u[:, :1])], axis=1)
    return gx, gy


def _divergence(px: jax.Array, py: jax.Array) -> jax.Array:
    """Backward-difference divergence of (B, H, W), adjoint of _grad_forward."""
    dx = jnp.concatenate([px[:, :, :1], px[:, :, 1:-1] - px[:, :, :-2],
                          -px[:, :, -2:-1]], axis=2)
    dy = jnp.concatenate([py[:, :1], py[:, 1:-1] - py[:, :-2],
                          -py[:, -2:-1]], axis=1)
    return dx + dy


def _tvl1_level(i0: jax.Array, i1: jax.Array, u: jax.Array, *,
                num_warps: int, num_iters: int, tau: float, lam: float,
                theta: float) -> jax.Array:
    """Fixed-point TV-L1 at one pyramid level.  i0/i1 (B,H,W), u (B,H,W,2)."""
    B, H, W = i0.shape
    ys, xs = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    g1x, g1y = _grad_central(i1)
    fields = jnp.stack([i1, g1x, g1y], axis=-1)       # (B, H, W, 3)
    l_t = lam * theta
    sigma = tau / theta
    eps = 1e-9

    def warp_iter(_, carry):
        u, p = carry                                  # (B,H,W,2), (B,H,W,2,2)
        u0x, u0y = u[..., 0], u[..., 1]
        # Warp the second image and its gradient to the current flow (one
        # 3-channel MXU sampling pass).
        w = _warp_fields(fields, xs + u0x, ys + u0y)
        i1w, gx, gy = w[..., 0], w[..., 1], w[..., 2]
        grad_sq = gx * gx + gy * gy
        # rho(u') = I1w + <gradI1w, u' - u0> - I0, linearized at u0.
        rho_c = i1w - gx * u0x - gy * u0y - i0

        def pd_iter(_, carry):
            u, p = carry
            rho = rho_c + gx * u[..., 0] + gy * u[..., 1]
            # Pointwise thresholding: exact minimizer of the L1 data term.
            case_lo = rho < -l_t * grad_sq
            case_hi = rho > l_t * grad_sq
            dx = jnp.where(case_lo, l_t * gx,
                           jnp.where(case_hi, -l_t * gx,
                                     -rho * gx / jnp.maximum(grad_sq, eps)))
            dy = jnp.where(case_lo, l_t * gy,
                           jnp.where(case_hi, -l_t * gy,
                                     -rho * gy / jnp.maximum(grad_sq, eps)))
            v = u + jnp.stack([dx, dy], axis=-1)
            # TV proximal step on each flow component via its dual field.
            new_u, new_p = [], []
            for c in range(2):
                uc = v[..., c] + theta * _divergence(p[..., c, 0], p[..., c, 1])
                gux, guy = _grad_forward(uc)
                den = 1.0 + sigma * jnp.sqrt(gux * gux + guy * guy)
                new_p.append(jnp.stack([(p[..., c, 0] + sigma * gux) / den,
                                        (p[..., c, 1] + sigma * guy) / den],
                                       axis=-1))
                new_u.append(uc)
            return jnp.stack(new_u, axis=-1), jnp.stack(new_p, axis=-2)

        return jax.lax.fori_loop(0, num_iters, pd_iter, (u, p))

    p0 = jnp.zeros(i0.shape + (2, 2), jnp.float32)
    u, _ = jax.lax.fori_loop(0, num_warps, warp_iter, (u, p0))
    return u


@functools.partial(
    jax.jit,
    static_argnames=("num_levels", "num_warps", "num_iters", "fine_iters"),
)
def tvl1_flow(i0: jax.Array, i1: jax.Array, *, num_levels: int = 4,
              num_warps: int = 5, num_iters: int = 100,
              fine_iters: int = 40, tau: float = 0.25,
              lam: float = 0.15, theta: float = 0.3) -> jax.Array:
    """Estimate dense TV-L1 optical flow from i0 to i1.

    Args:
      i0, i1: (B, H, W) grayscale frames; any affine intensity range (they
        are rescaled to [0, 255] internally — `lam` is calibrated for 8-bit
        intensities, following the IPOL reference implementation).
      num_levels: pyramid depth (scale 0.5 per level).
      num_warps / num_iters: warps per level / primal-dual iterations per
        warp.  `fine_iters` applies at the FINEST level only — the coarse
        levels do the real convergence work and the finest level (most of
        the cost: 4x the pixels of the next level) only refines; measured
        p90 error on a 3.6-px translation: 0.011 px at fine_iters=100,
        0.017 at 50, 0.024 at 30, at ~45% less total cost for 40.

    Returns:
      (B, H, W, 2) pixel displacement u with i0(p) ~= i1(p + u(p)).
    """
    B, H, W = i0.shape
    # Normalize to [0, 255]: lambda's data-vs-TV balance AND the hinge-case
    # step size (l_t * |grad I|) are calibrated for 8-bit intensities in the
    # IPOL reference; on [0,1] images the steps are 255x too small and the
    # solver visibly stalls on spatially varying fields.
    lo = jnp.minimum(jnp.min(i0), jnp.min(i1))
    hi = jnp.maximum(jnp.max(i0), jnp.max(i1))
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    i0 = (i0.astype(jnp.float32) - lo) * scale
    i1 = (i1.astype(jnp.float32) - lo) * scale

    # Static pyramid (coarse shapes rounded to multiples of 8 for layout).
    shapes = [(H, W)]
    for _ in range(num_levels - 1):
        h, w = shapes[-1]
        shapes.append((max(h // 2 // 8 * 8, 16), max(w // 2 // 8 * 8, 16)))
    pyr0, pyr1 = [i0], [i1]
    for h, w in shapes[1:]:
        pyr0.append(resize_bilinear_bhw(pyr0[-1], (h, w)))
        pyr1.append(resize_bilinear_bhw(pyr1[-1], (h, w)))

    u = jnp.zeros((B,) + shapes[-1] + (2,), jnp.float32)
    for lvl in range(num_levels - 1, -1, -1):
        u = _tvl1_level(
            pyr0[lvl], pyr1[lvl], u, num_warps=num_warps,
            num_iters=(fine_iters if lvl == 0 else num_iters),
            tau=tau, lam=lam, theta=theta)
        if lvl > 0:
            h, w = shapes[lvl - 1]
            hs, ws = shapes[lvl]
            # Upsample the flow and rescale the displacement units.
            u = jnp.stack(
                [resize_bilinear_bhw(u[..., 0], (h, w)) * (w / ws),
                 resize_bilinear_bhw(u[..., 1], (h, w)) * (h / hs)],
                axis=-1,
            )
    return u


def flow_to_sampling(u: jax.Array) -> jax.Array:
    """Convert displacement flow to the record/temporal-loss convention.

    The training records store flow as ABSOLUTE NDC sampling coordinates in
    the warp library's (x+1)*size/2 convention: flow(p) is where frame-2
    content for frame-1 pixel p sits (see data/synthetic.py and
    train/train.py's temporal loss; reference train_bundle_nobm.py:115-126).

    Args:
      u: (B, H, W, 2) pixel displacement from `tvl1_flow`.

    Returns:
      (B, H, W, 2) NDC sampling coordinates.
    """
    B, H, W = u.shape[:3]
    ys, xs = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    return jnp.stack(
        [2.0 * (xs + u[..., 0]) / W - 1.0,
         2.0 * (ys + u[..., 1]) / H - 1.0],
        axis=-1,
    )
