import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas
from stabnet_tpu.ops.warp import bilinear_sample
rng = np.random.RandomState(0)
H,W,C = 720, 1280, 3
im = jnp.asarray(rng.rand(1,H,W,C).astype(np.float32))
gx = np.linspace(-1,1,W,dtype=np.float32); gy = np.linspace(-1,1,H,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
xm = jnp.asarray((xg*0.95 + 0.02*np.sin(yg*3))[None].astype(np.float32))
ym = jnp.asarray((yg*0.95 + 0.02*np.cos(xg*2))[None].astype(np.float32))
refb = np.asarray(bilinear_sample(im, xm, ym))
n=50
for th in (8, 16):
    for exact in (True, False):
        f = jax.jit(lambda im,x,y,th=th,ex=exact: bilinear_sample_pallas(im,x,y,interpret=False,tile_h=th,exact=ex))
        try:
            r = f(im,xm,ym); _=float(jnp.sum(r[:, ::53, ::97]))
        except Exception as e:
            print(f"th={th} exact={exact}: FAIL {str(e)[:120]}", flush=True); continue
        t0=time.perf_counter()
        for _ in range(n): r = f(im,xm,ym)
        _=float(jnp.sum(r[:, ::53, ::97]))
        err = np.abs(refb-np.asarray(r)).max()
        print(f"th={th} exact={exact}: {(time.perf_counter()-t0)/n*1e3:.3f} ms, maxerr={err:.2e}", flush=True)
