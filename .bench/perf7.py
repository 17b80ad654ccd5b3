import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.stream.engine import resize_bilinear
from stabnet_tpu.ops.pallas_warp import warp_uint8_cf, _sample_core
cfg = get_config("v2_93")
S = 1
rng = np.random.RandomState(0)
gx = np.linspace(-1,1,512,dtype=np.float32); gy = np.linspace(-1,1,288,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
GX = np.linspace(-1,1,1280,dtype=np.float32); GY = np.linspace(-1,1,720,dtype=np.float32)
XG, YG = np.meshgrid(GX, GY)

def slope(name, make_f, make_xs):
    ts = {}
    for T in (8, 40):
        f = make_f(T); xs = make_xs(T)
        r = f(xs); _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        t0=time.perf_counter(); n=3
        for _ in range(n): r = f(xs)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        ts[T] = (time.perf_counter()-t0)/n
    print(f"{name}: {(ts[40]-ts[8])/32*1e3:.3f} ms/frame", flush=True)

def maps288(T):
    xm = jnp.asarray(np.stack([(xg*0.98 + 0.001*t)[None] for t in range(T)]).astype(np.float32))
    ym = jnp.asarray(np.stack([(yg*0.98 - 0.001*t)[None] for t in range(T)]).astype(np.float32))
    return (xm, ym)
def maps720(T):
    xm = jnp.asarray(np.stack([(XG*0.98 + 0.001*t)[None] for t in range(T)]).astype(np.float32))
    ym = jnp.asarray(np.stack([(YG*0.98 - 0.001*t)[None] for t in range(T)]).astype(np.float32))
    return (xm, ym)

# a) resize chain only: 288 -> 72x128 -> 720p for 2 maps
def mk_resize(T):
    def body(c, x):
        xm, ym = x
        xs1 = resize_bilinear(xm, (72,128)); ys1 = resize_bilinear(ym, (72,128))
        xs2 = resize_bilinear(xs1, (720,1280)); ys2 = resize_bilinear(ys1, (720,1280))
        return c, jnp.sum(xs2[:, ::97, ::119]) + jnp.sum(ys2[:, ::97, ::119])
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
slope("resize chain", mk_resize, maps288)

# b) pallas 720p u8cf with precomputed 720p maps, fixed color
col = jnp.asarray(rng.randint(0,255,(S,3,720,1280),dtype=np.uint8))
def mk_pallas(T):
    def body(c, x):
        w = warp_uint8_cf(col, x[0], x[1], interpret=False)
        return c, jnp.sum(w[:, ::97, ::119, 0].astype(jnp.int32))
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
slope("pallas u8cf 720p (maps varying)", mk_pallas, maps720)

# c) pallas 720p f32 non-exact, same
colf = col.astype(jnp.float32)
from stabnet_tpu.ops.pallas_warp import _sample_core
def mk_pallas_f(T):
    def body(c, x):
        w = _sample_core(colf, x[0], x[1], 32, 384, False, 8, False, False)
        return c, jnp.sum(w[:, ::97, ::119, 0])
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
slope("pallas f32cf 720p (maps varying)", mk_pallas_f, maps720)
