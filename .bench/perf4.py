import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

def scan_bench(name, body, carry0, T=30, n=4):
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=T))
    c, o = f(carry0); _ = float(jnp.sum(o))
    t0=time.perf_counter()
    for _ in range(n):
        c, o = f(carry0)
    _ = float(jnp.sum(o))
    print(f"{name}: {(time.perf_counter()-t0)/(T*n)*1e3:.3f} ms/iter", flush=True)

# empty scan, tiny carry
c0 = jnp.zeros((8,128), jnp.float32)
def body0(c, _):
    return c + 1.0, jnp.sum(c[0, ::7])
scan_bench("empty scan tiny carry", body0, c0)

# empty scan, big carry (38MB like the ring)
cb = jnp.zeros((1,32,288,512), jnp.float32)
def body1(c, _):
    return c.at[:, 0, 0, 0].add(1.0), jnp.sum(c[:, 0, 0, ::7])
scan_bench("empty scan 19MB carry", body1, cb)

# two ring buffers + slices (match B2 data)
cb2 = (jnp.zeros((1,32,288,512), jnp.float32), jnp.zeros((1,32,288,512), jnp.float32), jnp.zeros((), jnp.int32))
def body2(c, _):
    f, m, p = c
    sl = [jax.lax.dynamic_index_in_dim(f, (p - i) % 32, axis=1, keepdims=True) for i in (1,2,4,8,16,32)]
    x = jnp.concatenate(sl, axis=1)
    nf = x[:, 0]
    f2 = jax.lax.dynamic_update_index_in_dim(f, nf, p % 32, axis=1)
    m2 = jax.lax.dynamic_update_index_in_dim(m, nf, p % 32, axis=1)
    return (f2, m2, p+1), jnp.sum(nf[:, ::97, ::119])
scan_bench("ring slices scan", body2, cb2)

# plain jit loop (no scan): 30 sequential adds
x = jnp.zeros((288,512), jnp.float32)
@jax.jit
def chain(x):
    for _ in range(30):
        x = x + 1.0
    return jnp.sum(x[::97, ::119])
r = chain(x); _ = float(r)
t0=time.perf_counter()
for _ in range(4): r = chain(x)
_ = float(r)
print(f"unrolled 30 adds: {(time.perf_counter()-t0)/(30*4)*1e3:.3f} ms/iter", flush=True)
