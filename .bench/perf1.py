import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas

cfg = get_config("v2_93")
model = make_model(cfg)
variables = init_variables(model, cfg, jax.random.PRNGKey(0))

def scan_bench(name, body, carry0, T=30, n=2):
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=T))
    c, o = f(carry0); _ = float(jnp.sum(o))
    t0=time.perf_counter()
    for _ in range(n):
        c, o = f(carry0)
    _ = float(jnp.sum(o))
    print(f"{name}: {(time.perf_counter()-t0)/(T*n)*1e3:.3f} ms/iter", flush=True)

# net fwd at S=1 and S=4
for S in (1, 4):
    x0 = jnp.zeros((S,288,512,13), jnp.float32)
    def body(c, _):
        th = model.apply(variables, c, train=False)
        return c, jnp.sum(th)
    scan_bench(f"net S={S}", body, x0)

# color warp variants at S=1 (within scan to mimic production)
col = jnp.zeros((1,720,1280,3), jnp.float32)
gx = np.linspace(-1,1,1280,dtype=np.float32); gy = np.linspace(-1,1,720,dtype=np.float32)
xg, yg = np.meshgrid(gx, gy)
xmB = jnp.asarray((xg*0.98)[None]); ymB = jnp.asarray((yg*0.98)[None])
for yb, xb, ex in [(32,384,False), (24,384,False), (32,384,True)]:
    def body(c, _, yb=yb, xb=xb, ex=ex):
        w = bilinear_sample_pallas(c[0], c[1], c[2], y_band=yb, x_band=xb, interpret=False, exact=ex)
        return c, jnp.sum(w[:, ::97, ::119])
    scan_bench(f"colorwarp yb={yb} xb={xb} exact={ex}", body, (col, xmB, ymB))
