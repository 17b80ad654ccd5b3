import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.data import augment_batch, make_raw_batch
cfg = get_config("v2_93")
raw = make_raw_batch(cfg, cfg.batch_size, seed=0)
from stabnet_tpu.data import prepare_raw
raw = prepare_raw(raw)
aug = jax.jit(lambda k, r: augment_batch(k, r, cfg))
key = jax.random.PRNGKey(1)

def timeit(name, f, n=5):
    r = f(); _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0=time.perf_counter()
    for _ in range(n): r = f()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

timeit("aug host-raw (upload each call)", lambda: aug(key, raw))
rawd = jax.tree_util.tree_map(jnp.asarray, raw)
jax.block_until_ready(jax.tree_util.tree_leaves(rawd)[0])
timeit("aug device-raw", lambda: aug(key, rawd))
t0=time.perf_counter()
r2 = jax.tree_util.tree_map(jnp.asarray, raw)
_ = float(jnp.sum(jax.tree_util.tree_leaves(r2)[0]))
print(f"upload raw batch once: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
