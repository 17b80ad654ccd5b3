"""Batched 4-point DLT homography solves for the multi-grid warp.

Reference semantics: spatial_transformer3.py:144-198 (`get_H`, `get_Hs`).  The
reference loops Python-side over the 16 mesh cells, building one (B,8,8) system
per cell.  Here the whole mesh is solved as ONE batched (B, grid_h*grid_w, 8, 8)
linear solve so XLA lowers it to a single batched kernel — no per-cell Python
loop, no 16 tiny dispatches.

Convention (matches the reference): for each mesh cell, `src` holds the four
regular-grid corner positions of the OUTPUT cell in NDC ([-1,1]^2) and `dst`
holds the predicted mesh vertex positions; the returned homography H satisfies
H @ [x_src, y_src, 1]^T ~ [x_dst, y_dst, 1]^T, i.e. it maps output pixels to
input-frame sampling locations.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np

# When set, `solve_dlt` uses the portable unrolled Gauss-Jordan solver
# (`_solve8`) instead of `jnp.linalg.solve`.  Flip it with `portable_solve()`
# while tracing computations that must deserialize cleanly via `jax.export`:
# on CPU, `jnp.linalg.solve` lowers to LAPACK FFI custom calls that crash
# when invoked from a deserialized artifact (jaxlib 0.9.0; stream/export.py).
# It is NOT the default because the live streaming engine relies on the
# solve being bit-identical between its two compilations (lax.scan clip path
# vs straight-line step path, tests/test_stream_scan.py): an opaque solve
# custom call guarantees that, while inlined elimination steps can round
# differently per program — a near-tie pivot then flips, the two solutions
# split at O(eps * cond), and the streaming history feedback amplifies the
# split into visible pixels.  A ContextVar (not a module global) so a live
# engine tracing on another thread never picks up an export's solver.
_PORTABLE_SOLVE = contextvars.ContextVar("stabnet_portable_solve",
                                         default=False)


@contextlib.contextmanager
def portable_solve():
    """Trace `solve_dlt` with the export-safe elimination solver."""
    token = _PORTABLE_SOLVE.set(True)
    try:
        yield
    finally:
        _PORTABLE_SOLVE.reset(token)


def solve_dlt(src: jax.Array, dst: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Solve for homographies mapping 4 src points to 4 dst points.

    Args:
      src: (..., 4, 2) source quad corners (x, y).
      dst: (..., 4, 2) destination quad corners (x, y).
      eps: Tikhonov regularizer added to the 8x8 system diagonal
           (reference: spatial_transformer3.py:144-145 `pinv`).

    Returns:
      (..., 3, 3) homographies with H[2,2] == 1.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    x, y = src[..., 0], src[..., 1]          # (..., 4)
    u, v = dst[..., 0], dst[..., 1]          # (..., 4)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)

    # Rows 0-3:  [x y 1 0 0 0 -x*u -y*u] ; rows 4-7: [0 0 0 x y 1 -x*v -y*v]
    # (same layout as reference spatial_transformer3.py:159-168)
    top = jnp.stack([x, y, one, zero, zero, zero, -x * u, -y * u], axis=-1)
    bot = jnp.stack([zero, zero, zero, x, y, one, -x * v, -y * v], axis=-1)
    A = jnp.concatenate([top, bot], axis=-2)               # (..., 8, 8)
    b = jnp.concatenate([u, v], axis=-1)[..., None]        # (..., 8, 1)

    A = A + eps * jnp.eye(8, dtype=A.dtype)
    # The reference computes inv(A + eps I) @ b; a batched solve is the
    # XLA-native equivalent (one fused batched LU kernel).  See
    # `_PORTABLE_SOLVE` above for when the elimination solver is used instead.
    if _PORTABLE_SOLVE.get():
        h = _solve8(A, b[..., 0])                          # (..., 8)
    else:
        h = jnp.linalg.solve(A, b)[..., 0]                 # (..., 8)
    ones = jnp.ones(h.shape[:-1] + (1,), h.dtype)
    return jnp.concatenate([h, ones], axis=-1).reshape(h.shape[:-1] + (3, 3))


def _solve8(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 8x8 linear solve: Gauss-Jordan with partial pivoting.

    Args:
      A: (..., 8, 8) systems;  b: (..., 8) right-hand sides.

    Returns:
      (..., 8) solutions, matching LU-with-pivoting (LAPACK) to fp roundoff.
    """
    n = A.shape[-1]
    batch = A.shape[:-2]
    M = jnp.concatenate([A, b[..., None]], axis=-1)        # (..., 8, 9)
    M = M.reshape((-1, n, n + 1))
    # The barriers pin fusion boundaries so programs embedding this solver
    # compile each elimination step to a stable schedule (surrounding ops
    # can't fuse in and change FMA contraction).  The materialized buffer is
    # a tiny (N, 8, 9).
    M = jax.lax.optimization_barrier(M)
    rows = jnp.arange(n)
    for k in range(n):                                     # static unroll
        # Partial pivot: the largest |column k| entry among rows >= k.
        col = jnp.abs(M[:, :, k])
        col = jnp.where(rows[None, :] < k, -jnp.inf, col)
        p = jnp.argmax(col, axis=1)                        # (N,)
        # Swap rows k and p (gather with a per-batch permuted index).
        idx = jnp.where(rows[None, :] == k, p[:, None],
                        jnp.where(rows[None, :] == p[:, None], k, rows[None, :]))
        M = jnp.take_along_axis(M, idx[:, :, None], axis=1)
        # Normalize the pivot row, eliminate it from every other row.
        piv = M[:, k, :] / M[:, k, k][:, None]             # (N, 9)
        f = jnp.where(rows[None, :] == k, 0.0, M[:, :, k]) # (N, 8)
        M = M - f[:, :, None] * piv[:, None, :]
        M = jnp.where((rows == k)[None, :, None], piv[:, None, :], M)
        M = jax.lax.optimization_barrier(M)
    return M[:, :, n].reshape(batch + (n,))


@functools.lru_cache(maxsize=None)
def cell_src_corners(grid_h: int, grid_w: int) -> np.ndarray:
    """Regular-grid NDC corner quads for every mesh cell.

    Returns (grid_h, grid_w, 4, 2) float32 with corner order
    (top-left, top-right, bottom-left, bottom-right) — the order used by the
    reference when assembling `ori` (spatial_transformer3.py:187-189).
    """
    h = 2.0 / grid_h
    w = 2.0 / grid_w
    out = np.zeros((grid_h, grid_w, 4, 2), np.float32)
    for i in range(grid_h):
        for j in range(grid_w):
            hh = i * h - 1.0
            ww = j * w - 1.0
            out[i, j] = [[ww, hh], [ww + w, hh], [ww, hh + h], [ww + w, hh + h]]
    return out


def mesh_cell_corners(mesh: jax.Array) -> jax.Array:
    """Gather per-cell corner quads from a vertex mesh.

    Args:
      mesh: (..., grid_h+1, grid_w+1, 2) mesh vertex positions.

    Returns:
      (..., grid_h, grid_w, 4, 2) quads in (tl, tr, bl, br) order
      (reference: spatial_transformer3.py:191-193).
    """
    tl = mesh[..., :-1, :-1, :]
    tr = mesh[..., :-1, 1:, :]
    bl = mesh[..., 1:, :-1, :]
    br = mesh[..., 1:, 1:, :]
    return jnp.stack([tl, tr, bl, br], axis=-2)


def mesh_to_homographies(mesh: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    """Convert a predicted vertex mesh to per-cell homographies.

    One batched DLT solve over all cells (reference equivalent:
    spatial_transformer3.py:179-198 `get_Hs`, which loops cells in Python).

    Args:
      mesh: (B, grid_h+1, grid_w+1, 2) predicted mesh vertices in NDC.

    Returns:
      (B, grid_h, grid_w, 3, 3) homographies mapping regular output-cell
      corners to mesh vertices.
    """
    src = jnp.asarray(cell_src_corners(grid_h, grid_w))    # (gh, gw, 4, 2)
    src = jnp.broadcast_to(src, mesh.shape[:-3] + src.shape)
    dst = mesh_cell_corners(mesh)                          # (B, gh, gw, 4, 2)
    return solve_dlt(src, dst)


def apply_homography(H: jax.Array, pts: jax.Array, z_eps: float = 1e-8) -> jax.Array:
    """Apply 3x3 homographies to 2-D points with the reference's sign-eps guard.

    Args:
      H: (..., 3, 3).
      pts: (..., N, 2) points (x, y).

    Returns:
      (..., N, 2) projectively transformed points.  The divisor z is nudged
      away from zero by +/-1e-8 with sign(z>=0) (reference:
      spatial_transformer3.py:253-260).
    """
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    p = jnp.concatenate([pts, ones], axis=-1)              # (..., N, 3)
    q = jnp.einsum("...ij,...nj->...ni", H, p,
                   precision=jax.lax.Precision.HIGHEST)
    z = q[..., 2]
    sign = jnp.where(z >= 0, 1.0, -1.0).astype(z.dtype)
    z = z + sign * z_eps
    return q[..., :2] / z[..., None]
