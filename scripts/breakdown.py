"""Per-stage device-time breakdown of the batch-8 streaming step (TPU).

Times each jitted stage with PER-ITERATION-VARYING inputs (loop-invariant
microbenchmarks get hoisted by XLA and lie — BASELINE.md) by scanning the
stage over a K-slice input batch and fencing with a scalar fetch.  Reports
ms per (stage call, S=8 frames).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.models import init_variables, make_model, scale_theta_head
from stabnet_tpu.ops import black_mask, dense_maps, mesh_to_homographies
from stabnet_tpu.ops.mesh import theta_to_mesh
from stabnet_tpu.ops.pallas_warp import (bilinear_sample_pallas,
                                         warp_uint8_cf_lowres)
from stabnet_tpu.ops.resize import resize_bilinear_bhw
from stabnet_tpu.stream import engine as eng

S = 8
K = 24          # scan length (distinct inputs per measured run)
REPS = 3

cfg = get_config("v2_93")
H, W = cfg.height, cfg.width
Ho, Wo = 720, 1280
model = make_model(cfg)
variables = init_variables(model, cfg, jax.random.PRNGKey(0))
variables = scale_theta_head(variables)

rng = np.random.RandomState(0)


def timeit(name, scan_fn, args):
    """scan_fn: (carry, xs_slice) -> (carry, fence_scalar); args: xs arrays
    with leading dim K."""
    f = jax.jit(lambda xs: jax.lax.scan(scan_fn, 0.0, xs)[0])
    xs = jax.tree_util.tree_map(jnp.asarray, args)
    r = f(xs)
    float(r)                      # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(xs)
    float(r)
    dt = (time.perf_counter() - t0) / (REPS * K) * 1e3
    print(f"{name:34s} {dt:7.3f} ms / call (S={S})")
    return dt


# --- inputs ------------------------------------------------------------------
x13 = rng.rand(K, S, H, W, cfg.in_channels).astype(np.float32) - 0.5
theta = (rng.rand(K, S, cfg.theta_dim).astype(np.float32) - 0.5) * 0.1
maps_x = np.broadcast_to(
    np.linspace(-0.98, 0.98, W, dtype=np.float32)[None, None, None, :],
    (K, S, H, W)).copy() + rng.rand(K, S, H, W).astype(np.float32) * 0.01
maps_y = np.broadcast_to(
    np.linspace(-0.98, 0.98, H, dtype=np.float32)[None, None, :, None],
    (K, S, H, W)).copy() + rng.rand(K, S, H, W).astype(np.float32) * 0.01
color_cf = rng.randint(0, 255, (K, S, 3, Ho, Wo), dtype=np.uint8)
gray = rng.rand(K, S, H, W).astype(np.float32) - 0.5

# --- stages ------------------------------------------------------------------

def s_net(c, xs):
    th = model.apply(variables, xs, train=False)
    return c + jnp.sum(th), None

timeit("net forward (13ch 288p)", lambda c, xs: (s_net(c, xs)[0], None), x13)


from stabnet_tpu.models.resnet import SlimConv

stem = SlimConv(64, 7, 2, use_bias=True, name="conv1")
stem_vars = stem.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 13),
                                                       jnp.bfloat16))


def s_stem(c, xs):
    out = stem.apply(stem_vars, xs.astype(jnp.bfloat16))
    return c + jnp.sum(out.astype(jnp.float32)[:, ::37, ::53]), None

timeit("stem conv1 7x7/2 13ch alone", s_stem, x13)

var_bf16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    variables)


def s_net16(c, xs):
    th = model.apply(var_bf16, xs, train=False)
    return c + jnp.sum(th), None

timeit("net forward (pre-cast bf16 params)",
       lambda c, xs: (s_net16(c, xs)[0], None), x13)


def s_assemble(c, g):
    state = eng.init_state(g, cfg)
    x = eng.assemble_input(state, g, cfg)
    return c + jnp.sum(x[:, ::37, ::53]), None

timeit("init+assemble 13ch input", s_assemble, gray)


def s_geom(c, th):
    mesh = theta_to_mesh(th, cfg.grid_h, cfg.grid_w, cfg.do_crop_rate)
    Hs = mesh_to_homographies(mesh, cfg.grid_h, cfg.grid_w)
    xm, ym = dense_maps(Hs, H, W)
    blk = black_mask(xm, ym)
    return c + jnp.sum(xm) + jnp.sum(ym) + jnp.sum(blk), None

timeit("mesh+DLT+dense_maps+black 288p", s_geom, theta)


def s_exact_warp(c, xs):
    xm, ym, im = xs
    out = bilinear_sample_pallas(im[..., None], xm, ym)
    return c + jnp.sum(out), None

timeit("288p exact warp (pallas)", s_exact_warp, (maps_x, maps_y, gray))


def s_down(c, xs):
    xm, ym = xs
    a = resize_bilinear_bhw(xm, (H // 4, W // 4))
    b = resize_bilinear_bhw(ym, (H // 4, W // 4))
    return c + jnp.sum(a) + jnp.sum(b), None

timeit("maps 4x down-resize", s_down, (maps_x, maps_y))


def s_color(c, xs):
    xm, ym, im = xs
    a = resize_bilinear_bhw(xm, (H // 4, W // 4))
    b = resize_bilinear_bhw(ym, (H // 4, W // 4))
    out = warp_uint8_cf_lowres(im, a, b, (Ho, Wo))
    return c + jnp.sum(out[:, ::131, ::173, :].astype(jnp.int32)), None

timeit("720p color warp (down+lowres)", s_color, (maps_x, maps_y, color_cf))


def s_full(state):
    def body(carry, xs):
        st = carry
        g, cc = xs
        st2, out = eng.stream_step(model, variables, st, g, cc, cfg,
                                   out_hw=(Ho, Wo), use_pallas=True,
                                   color_channels_first=True)
        return st2, jnp.sum(out.warped_color[:, ::131, ::173, :]
                            .astype(jnp.int32))
    return body

state0 = eng.init_state(jnp.asarray(gray[0]), cfg)
f = jax.jit(lambda st, g, cc: jax.lax.scan(s_full(None), st, (g, cc)))
g_all = jnp.asarray(gray)
c_all = jnp.asarray(color_cf)
st, fence = f(state0, g_all, c_all)
float(jnp.sum(fence))
t0 = time.perf_counter()
for _ in range(REPS):
    st, fence = f(state0, g_all, c_all)
float(jnp.sum(fence))
dt = (time.perf_counter() - t0) / (REPS * K) * 1e3
print(f"{'FULL stream_step':34s} {dt:7.3f} ms / call (S={S})")
