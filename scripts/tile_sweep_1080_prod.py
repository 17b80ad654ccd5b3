"""x_band sweep for the 1080p color warp on PRODUCTION-magnitude maps.

The noise-map sweep (tile_sweep_1080.py) bounds spans pessimistically
(+-5 px high-frequency jitter); real maps are smooth per-cell homographies
from production-scale theta, so narrower windows may still hit tier 1.
This sweep drives the REAL map pipeline: theta -> mesh -> dense maps ->
4x down-resize -> lowres kernel, theta drawn at the magnitude
scale_theta_head produces (|theta| ~ 0.1, the bench's setting).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.ops import dense_maps, mesh_to_homographies
from stabnet_tpu.ops.mesh import theta_to_mesh
from stabnet_tpu.ops.pallas_warp import warp_uint8_cf_lowres
from stabnet_tpu.ops.resize import resize_bilinear_bhw

S = 4
K = 24
REPS = 3
Ho, Wo = 1080, 1920

cfg = get_config("v2_93")
H, W = cfg.height, cfg.width
rng = np.random.RandomState(0)

theta = (rng.rand(K, S, cfg.theta_dim).astype(np.float32) - 0.5) * 0.2
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


def make_stage(x_band):
    def s_color(c, xs):
        cc, th = xs
        mesh = theta_to_mesh(th, cfg.grid_h, cfg.grid_w, cfg.do_crop_rate)
        Hs = mesh_to_homographies(mesh, cfg.grid_h, cfg.grid_w)
        xm, ym = dense_maps(Hs, H, W)
        xl = resize_bilinear_bhw(xm, (H // 4, W // 4))
        yl = resize_bilinear_bhw(ym, (H // 4, W // 4))
        out = warp_uint8_cf_lowres(cc, xl, yl, (Ho, Wo),
                                   y_band=32, x_band=x_band)
        return c + jnp.sum(out[:, ::97, ::119].astype(jnp.int32)).astype(
            jnp.float32), None
    return s_color


for xb in (96, 80, 72, 64, 80):
    timeit(f"1080p prod-maps x_band={xb}", make_stage(xb),
           (color_cf, theta))
