import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream.engine import (stream_step, init_state, assemble_input,
                                       _net_forward, warp_color, resize_bilinear)
from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas
cfg = get_config("v2_93")
model = make_model(cfg)
variables = init_variables(model, cfg, jax.random.PRNGKey(0))
S = 1
gray = jnp.zeros((S,288,512), jnp.float32)
color = jnp.zeros((S,720,1280,3), jnp.uint8)
state0 = init_state(gray, cfg)

def scan_bench(name, body, carry0, T=30, n=2):
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=T))
    c, o = f(carry0); _ = float(jnp.sum(o))
    t0=time.perf_counter()
    for _ in range(n):
        c, o = f(carry0)
    _ = float(jnp.sum(o))
    print(f"{name}: {(time.perf_counter()-t0)/(T*n)*1e3:.3f} ms/iter", flush=True)

def bodyA(st, _):
    st2, out = stream_step(model, variables, st, gray, color, cfg, use_pallas=True, out_hw=(720,1280))
    return st2, jnp.sum(out.black[:, ::97, ::119])
scan_bench("A full step", bodyA, state0)

def bodyB(st, _):
    x = assemble_input(st, gray, cfg)
    w = _net_forward(model, variables, x, cfg, use_pallas=True)
    nf = w.output[...,0] + w.black_pix*(-1.0)
    L = st.frames.shape[1]; slot = st.ptr % L
    wr = lambda r, v: jax.lax.dynamic_update_index_in_dim(r, v, slot, axis=1)
    st2 = st._replace(frames=wr(st.frames, nf), masks=wr(st.masks, w.black_pix), ptr=st.ptr+1,
                      all_black=st.all_black + jnp.round(w.black_pix).astype(jnp.int32))
    return st2, jnp.sum(w.black_pix[:, ::97, ::119])
scan_bench("B step w/o colorwarp", bodyB, state0)

# B2: assemble + ring only (no net): use fixed theta
def bodyB2(st, _):
    x = assemble_input(st, gray, cfg)
    nf = x[..., -1]
    L = st.frames.shape[1]; slot = st.ptr % L
    wr = lambda r, v: jax.lax.dynamic_update_index_in_dim(r, v, slot, axis=1)
    st2 = st._replace(frames=wr(st.frames, nf), masks=wr(st.masks, nf), ptr=st.ptr+1)
    return st2, jnp.sum(nf[:, ::97, ::119])
scan_bench("B2 assemble+ring only", bodyB2, state0)

# C new colorwarp
xm = jnp.zeros((S,288,512), jnp.float32); ym = jnp.zeros((S,288,512), jnp.float32)
def bodyC(c, _):
    w = warp_color(c[0], c[1], c[2], (720,1280), use_pallas=True)
    return c, jnp.sum(w[:, ::97, ::119].astype(jnp.int32))
scan_bench("C warp_color new", bodyC, (color, xm, ym))

# E: gray 288p pallas exact
g1 = jnp.zeros((S,288,512,1), jnp.float32)
def bodyE(c, _):
    w = bilinear_sample_pallas(c[0], c[1], c[2], interpret=False, exact=True)
    return c, jnp.sum(w[:, ::97, ::119, 0])
scan_bench("E gray288 pallas exact", bodyE, (g1, xm, ym))
