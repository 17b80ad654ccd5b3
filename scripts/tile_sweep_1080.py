"""Sweep tile shapes for the 1080p color-warp stage (TPU).

The 720p winner (tile 24x64, spans 32/96) was adopted globally; 1080p has
different divisibility (1080 = 24*45 = 40*27, 1920 = 64*30 = 128*15) and
2.25x the pixels per map cell, so its optimum may differ.  Methodology per
BASELINE.md: scan over K distinct inputs, scalar-fence, same process,
winner repeated for a noise bound.  S=4 matches the bench's 1080p leg.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.ops.pallas_warp import warp_uint8_cf_lowres
from stabnet_tpu.ops.resize import resize_bilinear_bhw

S = 4
K = 24
REPS = 3
Ho, Wo = 1080, 1920

cfg = get_config("v2_93")
H, W = cfg.height, cfg.width
rng = np.random.RandomState(0)

maps_x = np.broadcast_to(
    np.linspace(-0.98, 0.98, W, dtype=np.float32)[None, None, None, :],
    (K, S, H, W)).copy() + rng.rand(K, S, H, W).astype(np.float32) * 0.01
maps_y = np.broadcast_to(
    np.linspace(-0.98, 0.98, H, dtype=np.float32)[None, None, :, None],
    (K, S, H, W)).copy() + rng.rand(K, S, H, W).astype(np.float32) * 0.01
color_cf = rng.randint(0, 255, (K, S, 3, Ho, Wo), dtype=np.uint8)


def timeit(name, scan_fn, args):
    f = jax.jit(lambda xs: jax.lax.scan(scan_fn, 0.0, xs)[0])
    xs = jax.tree_util.tree_map(jnp.asarray, args)
    r = f(xs)
    float(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(xs)
    float(r)
    dt = (time.perf_counter() - t0) / (REPS * K) * 1e3
    print(f"{name:46s} {dt:7.3f} ms / call (S={S})", flush=True)
    return dt


def make_stage(tile_h, tile_w, y_band, x_band):
    def s_color(c, xs):
        cc, mx, my = xs
        xl = resize_bilinear_bhw(mx, (H // 4, W // 4))
        yl = resize_bilinear_bhw(my, (H // 4, W // 4))
        out = warp_uint8_cf_lowres(cc, xl, yl, (Ho, Wo),
                                   tile_h=tile_h, tile_w=tile_w,
                                   y_band=y_band, x_band=x_band)
        return c + jnp.sum(out[:, ::97, ::119].astype(jnp.int32)).astype(
            jnp.float32), None
    return s_color


CONFIGS = [
    (24, 64, 32, 96),        # production default (720p winner)
    (40, 64, 48, 96),        # taller: 1080 = 40*27 exact, fewer tile rows
    (24, 128, 32, 160),      # wider: 1920 = 128*15 exact, fewer tiles/row
    (40, 128, 48, 160),      # both
    (8, 128, 16, 160),       # short-wide (one 1024-lane vector per tile)
    (16, 128, 24, 160),      # mid-wide
    (24, 64, 32, 96),        # default repeat (noise bound)
]

for th, tw, yb, xb in CONFIGS:
    timeit(f"1080p lowres tile=({th},{tw}) band=({yb},{xb})",
           make_stage(th, tw, yb, xb), (color_cf, maps_x, maps_y))
