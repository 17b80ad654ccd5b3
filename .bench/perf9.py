import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas
rng = np.random.RandomState(0)
gxs = np.linspace(-1,1,512,dtype=np.float32); gys = np.linspace(-1,1,288,dtype=np.float32)
xgs, ygs = np.meshgrid(gxs, gys)
img = jnp.asarray(rng.rand(1,288,512,1).astype(np.float32))

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
    xmv = jnp.asarray(np.stack([(xgs*0.98 + 0.001*t)[None] for t in range(T)]).astype(np.float32))
    ymv = jnp.asarray(np.stack([(ygs*0.98 - 0.001*t)[None] for t in range(T)]).astype(np.float32))
    return (xmv, ymv)

for th, tw, yb, ex in [(16,64,32,True), (32,64,56,True), (16,128,32,True), (16,64,32,False)]:
    def mk(T, th=th, tw=tw, yb=yb, ex=ex):
        def body(c, x):
            w = bilinear_sample_pallas(img, x[0], x[1], y_band=yb, x_band=256,
                                       tile_h=th, tile_w=tw, exact=ex, interpret=False)
            return c, jnp.sum(w[:, ::97, ::119, 0])
        return jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(()), xs))
    slope(f"gray th={th} tw={tw} yb={yb} exact={ex}", mk, maps288)
