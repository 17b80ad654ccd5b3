import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas
from stabnet_tpu.ops.warp import bilinear_sample
rng = np.random.RandomState(0)
B,H,W,C = 1, 64, 128, 1
im = rng.rand(B,H,W,C).astype(np.float32)
gx = np.linspace(-1,1,W,dtype=np.float32); gy = np.linspace(-1,1,H,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
xm = (xg + 0.05*np.sin(yg*3))[None].astype(np.float32)
ym = (yg + 0.04*np.cos(xg*2))[None].astype(np.float32)
ref = np.asarray(bilinear_sample(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym)))
got = np.asarray(bilinear_sample_pallas(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym), interpret=False))
print("max diff", np.abs(ref-got).max(), flush=True)
xm2 = (xm + 0.7).astype(np.float32)
ref2 = np.asarray(bilinear_sample(jnp.asarray(im), jnp.asarray(xm2), jnp.asarray(ym)))
got2 = np.asarray(bilinear_sample_pallas(jnp.asarray(im), jnp.asarray(xm2), jnp.asarray(ym), interpret=False))
print("oob max diff", np.abs(ref2-got2).max(), flush=True)

H,W,C = 720, 1280, 3
im = jnp.asarray(rng.rand(1,H,W,C).astype(np.float32))
gx = np.linspace(-1,1,W,dtype=np.float32); gy = np.linspace(-1,1,H,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
xm = jnp.asarray((xg*0.95 + 0.02*np.sin(yg*3))[None].astype(np.float32))
ym = jnp.asarray((yg*0.95 + 0.02*np.cos(xg*2))[None].astype(np.float32))
f = jax.jit(lambda im,x,y: bilinear_sample_pallas(im,x,y,interpret=False))
r = f(im,xm,ym); _=float(jnp.sum(r[:, ::53, ::97]))
n=50
t0=time.perf_counter()
for _ in range(n): r = f(im,xm,ym)
_=float(jnp.sum(r[:, ::53, ::97]))
print(f"pallas 720p warp: {(time.perf_counter()-t0)/n*1e3:.3f} ms", flush=True)
refb = np.asarray(bilinear_sample(im, xm, ym))
print("720p max diff", np.abs(refb-np.asarray(r)).max(), flush=True)

# non-exact color-path timing
f2 = jax.jit(lambda im,x,y: bilinear_sample_pallas(im,x,y,interpret=False,exact=False))
r2 = f2(im,xm,ym); _=float(jnp.sum(r2[:, ::53, ::97]))
t0=time.perf_counter()
for _ in range(n): r2 = f2(im,xm,ym)
_=float(jnp.sum(r2[:, ::53, ::97]))
print(f"pallas 720p warp bf16: {(time.perf_counter()-t0)/n*1e3:.3f} ms", flush=True)
print("bf16 max abs err (0..1 scale):", np.abs(refb-np.asarray(r2)).max(), flush=True)
