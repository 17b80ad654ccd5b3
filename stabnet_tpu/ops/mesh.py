"""Mesh geometry: regressor output (theta) -> warp mesh and per-cell quads.

Reference semantics: s_net_bundle_nobm.py:29-71 (`get_4_pts`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.ops.homography import mesh_cell_corners


@functools.lru_cache(maxsize=None)
def base_mesh(grid_h: int, grid_w: int) -> np.ndarray:
    """Regular NDC vertex grid: (grid_h+1, grid_w+1, 2) with (x, y) entries.

    Vertex (i, j) sits at (j * 2/grid_w - 1, i * 2/grid_h - 1)
    (reference: s_net_bundle_nobm.py:44-46).
    """
    ys = np.arange(grid_h + 1, dtype=np.float32) * (2.0 / grid_h) - 1.0
    xs = np.arange(grid_w + 1, dtype=np.float32) * (2.0 / grid_w) - 1.0
    x_t, y_t = np.meshgrid(xs, ys)
    return np.stack([x_t, y_t], axis=-1)


def theta_to_mesh(theta: jax.Array, grid_h: int, grid_w: int,
                  do_crop_rate: float) -> jax.Array:
    """Predicted vertex offsets -> clamped mesh vertex positions.

    Args:
      theta: (B, (grid_h+1)*(grid_w+1)*2) per-vertex (dx, dy) offsets in the
        row-major vertex order used by the reference head.
      do_crop_rate: vertices are clamped to +/- 1/do_crop_rate
        (reference: s_net_bundle_nobm.py:37,58).

    Returns:
      (B, grid_h+1, grid_w+1, 2) mesh vertices ("pts2" in the reference).
    """
    B = theta.shape[0]
    offsets = theta.reshape(B, grid_h + 1, grid_w + 1, 2).astype(jnp.float32)
    mesh = jnp.asarray(base_mesh(grid_h, grid_w)) + offsets
    bound = 1.0 / do_crop_rate
    return jnp.clip(mesh, -bound, bound)


def cell_pts(mesh: jax.Array) -> jax.Array:
    """Per-cell corner bundles ("pts1"): (B, grid_h, grid_w, 8).

    Layout [x_tl, x_tr, x_bl, x_br, y_tl, y_tr, y_bl, y_br], matching the
    reference's reshape of stacked (x-row, y-row) corner matrices
    (s_net_bundle_nobm.py:63-68).
    """
    corners = mesh_cell_corners(mesh)                  # (B, gh, gw, 4, 2)
    return jnp.concatenate([corners[..., 0], corners[..., 1]], axis=-1)
