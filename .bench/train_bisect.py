import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.data import augment_batch, make_raw_batch
from stabnet_tpu.models import make_model
from stabnet_tpu.train.state import create_train_state
from stabnet_tpu.train.train import make_train_step, compute_losses, loss_gates

cfg = get_config("v2_93")
model = make_model(cfg)
state = create_train_state(model, cfg, jax.random.PRNGKey(0))
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

timeit("augment batch10", lambda: aug(key, raw))
batch = aug(key, raw)

gates = jax.tree_util.tree_map(jnp.asarray, {"use_theta":1.0,"use_temp":1.0,"use_black":1.0,"use_theta_only":0.0})
fwd = jax.jit(lambda p, b: compute_losses(model, p, state.batch_stats, b, cfg, gates)[0])
timeit("fwd losses only", lambda: fwd(state.params, batch))

step = make_train_step(model, cfg)
def dostep():
    global state
    state, stats = step(state, batch)
    return stats["total"]
timeit("full train step", dostep)
