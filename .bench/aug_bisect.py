import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.data import augment as A
cfg = get_config("v2_93")
rng = np.random.RandomState(0)
B = 10
keys = jax.random.split(jax.random.PRNGKey(0), B)

def timeit(name, f, *a, n=5):
    r = f(*a); _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0=time.perf_counter()
    for _ in range(n): r = f(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

params = jax.vmap(lambda k: A.draw_params(k, cfg))(keys)
stable = jnp.asarray(rng.rand(B, cfg.height, cfg.width, 14).astype(np.float32) - 0.5)
flow = jnp.asarray(rng.rand(B, cfg.height, cfg.width, 2).astype(np.float32))
hist = jnp.asarray(rng.rand(B, cfg.height, cfg.width, 6).astype(np.float32) - 0.5)
pts = jnp.asarray(rng.rand(B, cfg.max_matches, 4).astype(np.float32))
msk = jnp.ones((B, cfg.max_matches), jnp.bool_)

timeit("draw_params", jax.jit(jax.vmap(lambda k: A.draw_params(k, cfg))), keys)
timeit("warp_img 14ch", jax.jit(jax.vmap(lambda im, p: A.warp_img(im, p, cfg))), stable, params)
timeit("warp_flow", jax.jit(jax.vmap(lambda f, p: A.warp_flow(f, p, cfg))), flow, params)
timeit("warp_points", jax.jit(jax.vmap(lambda q, m, p: A.warp_points(q, m, p, cfg)[0])), pts, msk, params)
timeit("add_history_masks", jax.jit(jax.vmap(lambda k, h: A.add_history_masks(k, h, cfg)[0])), keys, hist)
