"""Throughput vs concurrent-stream count S for the whole-clip scan (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.data.synthetic import make_video
from stabnet_tpu.models import init_variables, make_model, scale_theta_head
from stabnet_tpu.stream import StreamEngine
from stabnet_tpu.stream.video_io import to_gray_train

cfg = get_config("v2_93")
model = make_model(cfg)
variables = init_variables(model, cfg, jax.random.PRNGKey(0))
variables = scale_theta_head(variables)

out_h, out_w = 720, 1280
T = 61
repeats = 2

uniq = make_video(8, out_h, out_w, seed=0, jitter=4.0)
color1 = uniq[np.arange(T) % 8][None]
gray1 = np.stack(
    [to_gray_train(f, cfg.height, cfg.width) for f in color1[0]])[None]

engine = StreamEngine(model, variables, cfg, out_hw=(out_h, out_w))


def measure(S):
    g = jnp.asarray(np.broadcast_to(gray1, (S,) + gray1.shape[1:]).copy())
    c = jnp.asarray(np.broadcast_to(color1, (S,) + color1.shape[1:]).copy())
    w, _ = engine.stabilize_clip(g, c)
    float(jnp.sum(w[:, -1, ::97, ::119, 0].astype(jnp.int32)))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(repeats):
            w, _ = engine.stabilize_clip(g, c)
        float(jnp.sum(w[:, -1, ::97, ::119, 0].astype(jnp.int32)))
        dt = time.perf_counter() - t0
        best = max(best, S * (T - 1) * repeats / dt)
    print(f"S={S:3d}  {best:7.1f} fps/chip")


values = ([int(v) for v in sys.argv[1:]] if len(sys.argv) > 1
          else [8, 12, 16, 24])
for S in values:
    try:
        measure(S)
    except Exception as e:
        print(f"S={S}  FAILED {type(e).__name__}: {str(e)[:100]}")
