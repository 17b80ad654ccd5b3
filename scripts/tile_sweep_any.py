"""Sweep color-warp tile shapes at an arbitrary output resolution (TPU).

Generalizes scripts/tile_sweep.py (which is pinned to 720p): the 1080p
stretch config has different divisibility (1080 = 24*45 = 40*27 = 36*30),
so the 720p winner need not carry over.  Methodology per BASELINE.md:
scan over K distinct inputs, scalar-fence, same process, repeat the
winner to bound noise.

Usage: STABNET_SWEEP_OUT=1080,1920 STABNET_SWEEP_S=4 python scripts/tile_sweep_any.py
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

Ho, Wo = (int(v) for v in
          os.environ.get("STABNET_SWEEP_OUT", "1080,1920").split(","))
S = int(os.environ.get("STABNET_SWEEP_S", "4"))
K = int(os.environ.get("STABNET_SWEEP_K", "24"))
REPS = 3

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
    print(f"{name:44s} {dt:7.3f} ms / call (S={S}, out={Ho}x{Wo})", flush=True)
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


# tile_h * tile_w must be a multiple of 128; prefer tile_h dividing Ho
# (no padded edge tiles).  Bands are the per-tile sample spans the DMA
# window must cover (8-aligned).
CONFIGS = [
    (24, 64, 32, 96),        # current production default
    (20, 64, 32, 96),        # 1080 = 20*54
    (36, 64, 48, 96),        # 1080 = 36*30 (fewer grid programs)
    (40, 64, 48, 96),        # 1080 = 40*27
    (24, 128, 32, 160),      # wide tile
    (12, 64, 24, 96),        # short tile
    (24, 64, 32, 96),        # default repeat (noise bound)
]

for th, tw, yb, xb in CONFIGS:
    timeit(f"lowres tile=({th},{tw}) band=({yb},{xb})",
           make_stage(th, tw, yb, xb), (color_cf, maps_x, maps_y))
