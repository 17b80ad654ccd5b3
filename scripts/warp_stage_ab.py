"""Time just the two Pallas warp stages at S=8 (breakdown methodology).

Used to A/B kernel changes against the recorded stage numbers
(720p color warp 6.674 ms/call, 288p exact warp 1.567 ms/call measured
immediately before the SMEM-min change in the same rig session).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.ops.pallas_warp import (bilinear_sample_pallas,
                                         warp_uint8_cf_lowres)
from stabnet_tpu.ops.resize import resize_bilinear_bhw

S = 8
K = 24
REPS = 3
Ho, Wo = 720, 1280

cfg = get_config("v2_93")
H, W = cfg.height, cfg.width
rng = np.random.RandomState(0)


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
    print(f"{name:34s} {dt:7.3f} ms / call (S={S})", flush=True)
    return dt


maps_x = np.broadcast_to(
    np.linspace(-0.98, 0.98, W, dtype=np.float32)[None, None, None, :],
    (K, S, H, W)).copy() + rng.rand(K, S, H, W).astype(np.float32) * 0.01
maps_y = np.broadcast_to(
    np.linspace(-0.98, 0.98, H, dtype=np.float32)[None, None, :, None],
    (K, S, H, W)).copy() + rng.rand(K, S, H, W).astype(np.float32) * 0.01
color_cf = rng.randint(0, 255, (K, S, 3, Ho, Wo), dtype=np.uint8)
gray = rng.rand(K, S, H, W, 1).astype(np.float32) - 0.5


def s_color(c, xs):
    cc, mx, my = xs
    xl = resize_bilinear_bhw(mx, (H // 4, W // 4))
    yl = resize_bilinear_bhw(my, (H // 4, W // 4))
    out = warp_uint8_cf_lowres(cc, xl, yl, (Ho, Wo))
    return c + jnp.sum(out[:, ::97, ::119].astype(jnp.int32)).astype(
        jnp.float32), None


timeit("720p color warp (down+lowres)", s_color, (color_cf, maps_x, maps_y))


def s_288(c, xs):
    g, mx, my = xs
    out = bilinear_sample_pallas(g, mx, my, exact=False)
    return c + jnp.sum(out[:, ::37, ::53]), None


timeit("288p warp (pallas, bf16)", s_288, (gray, maps_x, maps_y))


def s_288x(c, xs):
    g, mx, my = xs
    out = bilinear_sample_pallas(g, mx, my, exact=True)
    return c + jnp.sum(out[:, ::37, ::53]), None


timeit("288p warp (pallas, exact)", s_288x, (gray, maps_x, maps_y))
