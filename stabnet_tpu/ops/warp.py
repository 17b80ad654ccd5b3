"""Multi-grid warp engine: dense sampling maps, border masks, bilinear sampling.

Reference semantics: spatial_transformer3.py:200-301 (`_meshgrid2`,
`_transform3`, `_interpolate`).  The reference builds the dense map with a
Python double loop over the 4x4 mesh cells, concatenating 16 sub-grids.  Here
the whole map is produced by ONE einsum over a (grid_h, cell_h, grid_w, cell_w)
blocked pixel grid — no loops, static shapes, fully fusible by XLA.

Numerics intentionally preserved from the reference (required for output
parity):
  * output-pixel NDC grid uses linspace(-1, 1, n) i.e. px -> -1 + 2*px/(n-1)
    (spatial_transformer3.py:200-207),
  * projective divide guards z with +/-1e-8 by sign(z >= 0)
    (spatial_transformer3.py:253-260),
  * NDC -> input pixel uses (x + 1) * W / 2  (NOT (W-1)/2)
    (spatial_transformer3.py:80-82),
  * bilinear corner indices are clamped to the image and the interpolation
    weights are computed FROM THE CLAMPED integer coordinates
    (spatial_transformer3.py:85-121), giving clamp-to-edge with
    fade-to-zero outside the frame,
  * black mask = 1.0 where the sample coordinate leaves [-1, 1]^2
    (spatial_transformer3.py:282-286).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.ops import homography as hom


class WarpResult(NamedTuple):
    """Outputs of the multi-grid warp (reference: `transformer` return)."""

    output: jax.Array      # (B, H, W, C) warped image
    black_pix: jax.Array   # (B, H, W)   1.0 where sample fell outside input
    x_map: jax.Array       # (B, H, W)   NDC x sampling map
    y_map: jax.Array       # (B, H, W)   NDC y sampling map
    Hs: jax.Array          # (B, grid_h, grid_w, 3, 3) per-cell homographies


@functools.lru_cache(maxsize=None)
def _ndc_grid(height: int, width: int) -> np.ndarray:
    """Homogeneous NDC coordinates of the output pixel grid: (H, W, 3)."""
    xs = np.linspace(-1.0, 1.0, width, dtype=np.float32)
    ys = np.linspace(-1.0, 1.0, height, dtype=np.float32)
    x_t, y_t = np.meshgrid(xs, ys)
    return np.stack([x_t, y_t, np.ones_like(x_t)], axis=-1)


@functools.lru_cache(maxsize=None)
def _cell_id_map(height: int, width: int, grid_h: int, grid_w: int) -> np.ndarray:
    """(H, W) int32 mesh-cell index per output pixel.

    Cells are floor(height/grid_h) tall; the last row/column of cells absorbs
    the remainder (reference: spatial_transformer3.py:227-243).
    """
    gh = height // grid_h
    gw = width // grid_w
    rows = np.minimum(np.arange(height) // gh, grid_h - 1)
    cols = np.minimum(np.arange(width) // gw, grid_w - 1)
    return (rows[:, None] * grid_w + cols[None, :]).astype(np.int32)


def dense_maps(Hs: jax.Array, height: int, width: int) -> Tuple[jax.Array, jax.Array]:
    """Dense NDC sampling maps from per-cell homographies.

    Args:
      Hs: (B, grid_h, grid_w, 3, 3).

    Returns:
      (x_map, y_map), each (B, height, width), in NDC.
    """
    B, grid_h, grid_w = Hs.shape[0], Hs.shape[1], Hs.shape[2]
    grid = jnp.asarray(_ndc_grid(height, width))           # (H, W, 3)

    if height % grid_h == 0 and width % grid_w == 0:
        gh, gw = height // grid_h, width // grid_w
        blocked = grid.reshape(grid_h, gh, grid_w, gw, 3)
        # One batched contraction over all cells — replaces the reference's
        # 16-iteration Python loop (spatial_transformer3.py:231-269).
        T = jnp.einsum("bijxy,ihjwy->bihjwx", Hs, blocked,
                       precision=jax.lax.Precision.HIGHEST)
        T = T.reshape(B, height, width, 3)
    else:
        # Non-divisible fall-back: gather each pixel's cell homography.
        cid = jnp.asarray(_cell_id_map(height, width, grid_h, grid_w)).reshape(-1)
        Hs_flat = Hs.reshape(B, grid_h * grid_w, 3, 3)
        H_pix = jnp.take(Hs_flat, cid, axis=1)              # (B, H*W, 3, 3)
        T = jnp.einsum("bnxy,ny->bnx", H_pix, grid.reshape(-1, 3),
                       precision=jax.lax.Precision.HIGHEST)
        T = T.reshape(B, height, width, 3)

    z = T[..., 2]
    sign = jnp.where(z >= 0, 1.0, -1.0).astype(z.dtype)
    z = z + sign * 1e-8
    return T[..., 0] / z, T[..., 1] / z


def black_mask(x_map: jax.Array, y_map: jax.Array) -> jax.Array:
    """1.0 where the sampling coordinate leaves the input frame.

    Reference: spatial_transformer3.py:282-286.
    """
    oob = (x_map < -1.0) | (x_map > 1.0) | (y_map < -1.0) | (y_map > 1.0)
    return oob.astype(x_map.dtype)


def bilinear_sample(im: jax.Array, x_ndc: jax.Array, y_ndc: jax.Array) -> jax.Array:
    """Bilinearly sample `im` at NDC coordinates with reference edge semantics.

    Args:
      im: (B, H, W, C) input images.
      x_ndc, y_ndc: (B, Ho, Wo) sample coordinates in [-1, 1] (values outside
        fade to zero, matching the reference's clamped-weight scheme).

    Returns:
      (B, Ho, Wo, C) sampled images.

    Reference: spatial_transformer3.py:62-123 `_interpolate`.
    """
    B, H, W, C = im.shape
    out_shape = x_ndc.shape
    # NDC -> continuous pixel coordinates (reference uses * size / 2, an
    # intentional off-by-(n/(n-1)) quirk we preserve for parity).
    x = (x_ndc.astype(jnp.float32) + 1.0) * (W / 2.0)
    y = (y_ndc.astype(jnp.float32) + 1.0) * (H / 2.0)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)

    im_flat = im.reshape(B, H * W, C)
    flat = lambda yy, xx: (yy * W + xx).reshape(B, -1)

    def gather(idx):
        return jnp.take_along_axis(im_flat, idx[..., None], axis=1)

    Ia = gather(flat(y0c, x0c))
    Ib = gather(flat(y1c, x0c))
    Ic = gather(flat(y0c, x1c))
    Id = gather(flat(y1c, x1c))

    # Weights from the CLAMPED integer corners (parity-critical).
    x0f, x1f = x0c.astype(jnp.float32), x1c.astype(jnp.float32)
    y0f, y1f = y0c.astype(jnp.float32), y1c.astype(jnp.float32)
    xr = x.reshape(B, -1, 1)
    yr = y.reshape(B, -1, 1)
    wa = (x1f.reshape(B, -1, 1) - xr) * (y1f.reshape(B, -1, 1) - yr)
    wb = (x1f.reshape(B, -1, 1) - xr) * (yr - y0f.reshape(B, -1, 1))
    wc = (xr - x0f.reshape(B, -1, 1)) * (y1f.reshape(B, -1, 1) - yr)
    wd = (xr - x0f.reshape(B, -1, 1)) * (yr - y0f.reshape(B, -1, 1))

    out = wa * Ia + wb * Ib + wc * Ic + wd * Id
    return out.reshape(out_shape + (C,))


def transformer(U: jax.Array, mesh: jax.Array, grid_h: int, grid_w: int) -> WarpResult:
    """Warp images by a predicted multi-grid mesh.

    Args:
      U: (B, H, W, C) images to warp (the current unstable frame).
      mesh: (B, grid_h+1, grid_w+1, 2) predicted mesh vertices in NDC.

    Returns:
      WarpResult with the warped image, black-border mask, dense maps and the
      per-cell homographies.

    Reference: spatial_transformer3.py:19,218-301 `transformer`/`_transform3`.
    """
    B, H, W, _ = U.shape
    Hs = hom.mesh_to_homographies(mesh, grid_h, grid_w)
    x_map, y_map = dense_maps(Hs, H, W)
    black = black_mask(x_map, y_map)
    output = bilinear_sample(U, x_map, y_map)
    return WarpResult(output=output, black_pix=black, x_map=x_map, y_map=y_map, Hs=Hs)
