import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.ops.pallas_warp import warp_uint8_cf, bilinear_sample_pallas
from stabnet_tpu.ops.warp import bilinear_sample
rng = np.random.RandomState(0)

# correctness first (exact path, 720p)
H,W,C = 720, 1280, 3
im = jnp.asarray(rng.rand(1,H,W,C).astype(np.float32))
gx = np.linspace(-1,1,W,dtype=np.float32); gy = np.linspace(-1,1,H,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
xm = jnp.asarray((xg*0.95 + 0.02*np.sin(yg*3))[None].astype(np.float32))
ym = jnp.asarray((yg*0.95 + 0.02*np.cos(xg*2))[None].astype(np.float32))
ref = np.asarray(bilinear_sample(im, xm, ym))
got = np.asarray(bilinear_sample_pallas(im, xm, ym, interpret=False))
print("exact 16x64 maxerr:", np.abs(ref-got).max(), flush=True)
colu = jnp.asarray((np.asarray(im)*255).astype(np.uint8))
imcf = jnp.moveaxis(colu, -1, 1)
gotu = np.asarray(warp_uint8_cf(imcf, xm, ym, interpret=False))
refu = np.clip(np.round(np.asarray(bilinear_sample(colu.astype(jnp.float32), xm, ym))), 0, 255).astype(np.uint8)
print("u8cf 16x64 maxerr (LSB):", np.abs(gotu.astype(int)-refu.astype(int)).max(), flush=True)

# slope timing
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

def maps720(T):
    xmv = jnp.asarray(np.stack([(xg*0.98 + 0.001*t)[None] for t in range(T)]).astype(np.float32))
    ymv = jnp.asarray(np.stack([(yg*0.98 - 0.001*t)[None] for t in range(T)]).astype(np.float32))
    return (xmv, ymv)
def mk_pallas(T):
    def body(c, x):
        w = warp_uint8_cf(imcf, x[0], x[1], interpret=False)
        return c, jnp.sum(w[:, ::97, ::119, 0].astype(jnp.int32))
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
slope("pallas u8cf 16x64 720p", mk_pallas, maps720)

# gray 288p exact
gxs = np.linspace(-1,1,512,dtype=np.float32); gys = np.linspace(-1,1,288,dtype=np.float32)
xgs, ygs = np.meshgrid(gxs, gys)
img = jnp.asarray(rng.rand(1,288,512,1).astype(np.float32))
def maps288(T):
    xmv = jnp.asarray(np.stack([(xgs*0.98 + 0.001*t)[None] for t in range(T)]).astype(np.float32))
    ymv = jnp.asarray(np.stack([(ygs*0.98 - 0.001*t)[None] for t in range(T)]).astype(np.float32))
    return (xmv, ymv)
def mk_gray(T):
    def body(c, x):
        w = bilinear_sample_pallas(img, x[0], x[1], exact=True, interpret=False)
        return c, jnp.sum(w[:, ::97, ::119, 0])
    return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
slope("gray288 exact 16x64", mk_gray, maps288)
