import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from stabnet_tpu.config import get_config
from stabnet_tpu.data.synthetic import make_video
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream import StreamEngine
from stabnet_tpu.stream.video_io import to_gray_train

cfg = get_config("v2_93")
model = make_model(cfg)
variables = init_variables(model, cfg, jax.random.PRNGKey(0))
engine = StreamEngine(model, variables, cfg, out_hw=(720,1280))
uniq = make_video(8, 720, 1280, seed=0, jitter=4.0)

for T in (16, 61, 121):
    color = jnp.asarray(uniq[np.arange(T) % 8][None])
    gray = jnp.asarray(np.stack([to_gray_train(f, cfg.height, cfg.width) for f in np.asarray(color[0])])[None])
    w, st = engine.stabilize_clip(gray, color)
    _ = float(jnp.sum(st.all_black))
    n = 3
    t0=time.perf_counter()
    for _ in range(n):
        w, st = engine.stabilize_clip(gray, color)
    _ = float(jnp.sum(st.all_black))
    dt = (time.perf_counter()-t0)/n
    print(f"T={T}: {dt*1e3:.1f} ms/clip -> {(T-1)/dt:.1f} fps, {dt/(T-1)*1e3:.2f} ms/frame", flush=True)
