import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.ops.pallas_warp import warp_uint8_cf
from stabnet_tpu.ops.warp import bilinear_sample
rng = np.random.RandomState(0)
H,W,C = 720, 1280, 3
gx = np.linspace(-1,1,W,dtype=np.float32); gy = np.linspace(-1,1,H,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
xm = jnp.asarray((xg*0.95 + 0.02*np.sin(yg*3))[None].astype(np.float32))
ym = jnp.asarray((yg*0.95 + 0.02*np.cos(xg*2))[None].astype(np.float32))
colu = jnp.asarray(rng.randint(0,255,(1,H,W,C),dtype=np.uint8))
imcf = jnp.moveaxis(colu, -1, 1)
refu = np.clip(np.round(np.asarray(bilinear_sample(colu.astype(jnp.float32), xm, ym))), 0, 255).astype(np.uint8)
gotu = np.asarray(warp_uint8_cf(imcf, xm, ym, tile_h=16, tile_w=128, x_band=384, interpret=False))
print("u8 wide-tile maxerr (LSB):", np.abs(gotu.astype(int)-refu.astype(int)).max(),
      "mean:", np.abs(gotu.astype(int)-refu.astype(int)).mean(), flush=True)

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
for th, tw, xb in [(16,128,384), (16,64,256), (32,128,384)]:
    def mk(T, th=th, tw=tw, xb=xb):
        yb = 56 if th==32 else 32
        def body(c, x):
            w = warp_uint8_cf(imcf, x[0], x[1], tile_h=th, tile_w=tw, x_band=xb, y_band=yb, interpret=False)
            return c, jnp.sum(w[:, ::97, ::119, 0].astype(jnp.int32))
        return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
    slope(f"u8 th={th} tw={tw} xb={xb}", mk, maps720)
