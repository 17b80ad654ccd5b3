import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream.engine import (init_state, assemble_input, _net_forward,
                                       warp_color, resize_bilinear)
from stabnet_tpu.ops.pallas_warp import warp_uint8_cf, bilinear_sample_pallas
cfg = get_config("v2_93")
model = make_model(cfg)
variables = init_variables(model, cfg, jax.random.PRNGKey(0))
S = 1
rng = np.random.RandomState(0)

def slope(name, make_f, make_xs):
    ts = {}
    for T in (8, 40):
        f = make_f(T)
        xs = make_xs(T)
        r = f(xs); _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        t0=time.perf_counter(); n=3
        for _ in range(n): r = f(xs)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        ts[T] = (time.perf_counter()-t0)/n
    m = (ts[40]-ts[8])/32*1e3
    print(f"{name}: {m:.3f} ms/frame (marginal)", flush=True)

# 1. net with varying input
def mk_net(T):
    def body(c, x):
        th = model.apply(variables, x, train=False)
        return c, jnp.sum(th)
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
slope("net varying", mk_net, lambda T: jnp.asarray(rng.rand(T,S,288,512,13).astype(np.float32)*0.1))

# 2. gray 288p pallas exact, varying maps
gx = np.linspace(-1,1,512,dtype=np.float32); gy = np.linspace(-1,1,288,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
def mk_gray(T):
    im = jnp.asarray(rng.rand(S,288,512,1).astype(np.float32))
    def body(c, x):
        w = bilinear_sample_pallas(im, x[0], x[1], exact=True, interpret=False)
        return c, jnp.sum(w[:, ::97, ::119, 0])
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
def mk_gray_xs(T):
    xm = np.stack([(xg*0.98 + 0.001*t)[None] for t in range(T)]).astype(np.float32)
    ym = np.stack([(yg*0.98 - 0.001*t)[None] for t in range(T)]).astype(np.float32)
    return (jnp.asarray(xm), jnp.asarray(ym))
slope("gray288 pallas varying maps", mk_gray, mk_gray_xs)

# 3. color warp u8-cf varying maps + color
def mk_color(T):
    def body(c, x):
        col, xm, ym = x
        w = warp_color(col, xm, ym, (720,1280), use_pallas=True, channels_first=True)
        return c, jnp.sum(w[:, ::97, ::119, 0].astype(jnp.int32))
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
def mk_color_xs(T):
    col = jnp.asarray(rng.randint(0,255,(T,S,3,720,1280),dtype=np.uint8))
    xm = jnp.asarray(np.stack([(xg*0.98 + 0.001*t)[None] for t in range(T)]).astype(np.float32))
    ym = jnp.asarray(np.stack([(yg*0.98 - 0.001*t)[None] for t in range(T)]).astype(np.float32))
    return (col, xm, ym)
slope("colorwarp u8cf varying", mk_color, mk_color_xs)

# 4. assemble+ring varying gray
def mk_ring(T):
    st0 = init_state(jnp.zeros((S,288,512)), cfg)
    def body(st, g):
        x = assemble_input(st, g, cfg)
        nf = x[..., -1]
        slot = st.ptr % st.frames.shape[1]
        wr = lambda r, v: jax.lax.dynamic_update_index_in_dim(r, v, slot, axis=1)
        st2 = st._replace(frames=wr(st.frames, nf), masks=wr(st.masks, nf), ptr=st.ptr+1)
        return st2, jnp.sum(x[:, ::97, ::119, 3])
    return jax.jit(lambda xs: jax.lax.scan(body, st0, xs))
slope("assemble+ring varying", mk_ring, lambda T: jnp.asarray(rng.rand(T,S,288,512).astype(np.float32)))
