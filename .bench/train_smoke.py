import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.data import augment_batch, make_raw_batch
from stabnet_tpu.models import make_model
from stabnet_tpu.train.state import create_train_state
from stabnet_tpu.train.train import make_train_step

cfg = get_config("v2_93")
model = make_model(cfg)
state = create_train_state(model, cfg, jax.random.PRNGKey(0))
step = make_train_step(model, cfg)

print("generating synthetic batch...", flush=True)
raw = make_raw_batch(cfg, cfg.batch_size, seed=0)
from stabnet_tpu.data import prepare_raw
raw = prepare_raw(raw)
aug = jax.jit(lambda k, r: augment_batch(k, r, cfg))
key = jax.random.PRNGKey(1)
batch = aug(key, raw)
print("compiling train step...", flush=True)
t0 = time.perf_counter()
state, stats = step(state, batch)
first = {k: float(v) for k, v in stats.items()}
print(f"first step (compile): {time.perf_counter()-t0:.1f}s total={first['total']:.4f}", flush=True)

N = 50
t0 = time.perf_counter()
for i in range(N):
    key, sub = jax.random.split(key)
    batch = aug(sub, raw)
    state, stats = step(state, batch)
total = float(stats["total"])  # fence
dt = time.perf_counter() - t0
print(f"{N} steps: {dt:.2f}s -> {dt/N*1e3:.1f} ms/step ({cfg.batch_size*2} siamese examples/step)", flush=True)
print(f"final total={total:.4f} img1={float(stats['img1']):.4f} step={int(state.step)}", flush=True)
