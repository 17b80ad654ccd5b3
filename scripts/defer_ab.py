"""A/B: in-scan 720p color warp vs DEFERRED bulk warp after the scan (TPU).

Hypothesis: the color warp does not feed the online recurrence (only the
288p gray output does), so the scan can emit the smoothed low-res maps and
the full-res warp can run ONCE over all (T-1)*S frames after the scan —
amortizing per-call kernel dispatch that the scan pays every step.

Methodology per BASELINE.md: per-iteration-varying inputs, scalar-fence
readbacks, same-process A/B, repeats.
"""

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
from stabnet_tpu.ops.pallas_warp import warp_uint8_cf_lowres
from stabnet_tpu.ops.resize import resize_bilinear_bhw as resize_bilinear
from stabnet_tpu.stream import StreamEngine
from stabnet_tpu.stream.engine import (StreamState, _net_forward,
                                       assemble_input, init_state)
from stabnet_tpu.stream.video_io import to_gray_train

T = 61
S = 8
REPEATS = 2
Ho, Wo = 720, 1280

cfg = get_config("v2_93")
H, W = cfg.height, cfg.width
model = make_model(cfg)
variables = init_variables(model, cfg, jax.random.PRNGKey(0))
variables = scale_theta_head(variables)

uniq = make_video(8, Ho, Wo, seed=0, jitter=4.0)
color1 = uniq[np.arange(T) % 8][None]
gray1 = np.stack([to_gray_train(f, H, W) for f in color1[0]])[None]
colorS = jnp.asarray(np.broadcast_to(color1, (S,) + color1.shape[1:]).copy())
grayS = jnp.asarray(np.broadcast_to(gray1, (S,) + gray1.shape[1:]).copy())

engine = StreamEngine(model, variables, cfg, out_hw=(Ho, Wo))


def fence(a):
    return float(jnp.sum(a[:, -1, ::97, ::119, 0].astype(jnp.int32)))


def timeit(run, label):
    w = run()
    fence(w)
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        w = run()
    fence(w)
    dt = time.perf_counter() - t0
    fps = S * (T - 1) * REPEATS / dt
    print(f"{label}: {fps:.1f} fps/chip", flush=True)
    return fps


# --- A: current path (color warp inside the scan) ----------------------------
fps_a = timeit(lambda: engine.stabilize_clip(grayS, colorS)[0], "A in-scan")


# --- B: deferred bulk color warp (OOMs HBM at 480x720p: ~1.2 GB of uint8
# temporaries per transpose plus fallback-path masks; kept for reference,
# not run) ---------------------------------------------------------------
def clip_deferred(variables, clip_gray, clip_color_cf):
    state = init_state(clip_gray[:, 0], cfg)

    def body(state, cur_gray):
        x = assemble_input(state, cur_gray, cfg)
        warp = _net_forward(model, variables, x, cfg, use_pallas=True)
        out_gray = warp.output[..., 0]
        black = warp.black_pix
        new_frame = out_gray + black * (-1.0)
        L = state.frames.shape[1]
        slot = state.ptr % L

        def write(ring, value):
            return jax.lax.dynamic_update_index_in_dim(ring, value, slot,
                                                       axis=1)

        new_state = StreamState(
            frames=write(state.frames, new_frame),
            masks=write(state.masks, black),
            ptr=state.ptr + 1,
            all_black=state.all_black + jnp.round(black).astype(jnp.int32),
        )
        xs_lr = resize_bilinear(warp.x_map, (H // 4, W // 4))
        ys_lr = resize_bilinear(warp.y_map, (H // 4, W // 4))
        return new_state, (xs_lr, ys_lr)

    final_state, (xm, ym) = jax.lax.scan(
        body, state, jnp.moveaxis(clip_gray[:, 1:], 1, 0))
    Tm1 = xm.shape[0]
    xm = xm.reshape(Tm1 * S, *xm.shape[2:])
    ym = ym.reshape(Tm1 * S, *ym.shape[2:])
    col = jnp.moveaxis(clip_color_cf[:, 1:], 1, 0).reshape(
        Tm1 * S, 3, Ho, Wo)
    warped = warp_uint8_cf_lowres(col, xm, ym, (Ho, Wo))
    warped = jnp.moveaxis(warped.reshape(Tm1, S, Ho, Wo, 3), 0, 1)
    return warped, final_state


colorS_cf = jnp.moveaxis(colorS, -1, 2)      # (S, T, 3, Hf, Wf) once
fps_b = float("nan")                         # OOM — see note above


# --- B2: deferred, bulk warp in chunks of 12 frames via lax.map --------------
@jax.jit
def clip_deferred_chunked(variables, clip_gray, clip_color_cf):
    state = init_state(clip_gray[:, 0], cfg)

    def body(state, cur_gray):
        x = assemble_input(state, cur_gray, cfg)
        warp = _net_forward(model, variables, x, cfg, use_pallas=True)
        out_gray = warp.output[..., 0]
        black = warp.black_pix
        new_frame = out_gray + black * (-1.0)
        L = state.frames.shape[1]
        slot = state.ptr % L

        def write(ring, value):
            return jax.lax.dynamic_update_index_in_dim(ring, value, slot,
                                                       axis=1)

        new_state = StreamState(
            frames=write(state.frames, new_frame),
            masks=write(state.masks, black),
            ptr=state.ptr + 1,
            all_black=state.all_black + jnp.round(black).astype(jnp.int32),
        )
        xs_lr = resize_bilinear(warp.x_map, (H // 4, W // 4))
        ys_lr = resize_bilinear(warp.y_map, (H // 4, W // 4))
        return new_state, (xs_lr, ys_lr)

    final_state, (xm, ym) = jax.lax.scan(
        body, state, jnp.moveaxis(clip_gray[:, 1:], 1, 0))
    Tm1 = xm.shape[0]
    CH = 12
    n = Tm1 // CH
    assert n * CH == Tm1, (Tm1, CH)
    col = jnp.moveaxis(clip_color_cf[:, 1:], 1, 0)          # (T-1, S, 3, ...)

    def chunk(args):
        xmc, ymc, colc = args
        return warp_uint8_cf_lowres(
            colc.reshape(CH * S, 3, Ho, Wo),
            xmc.reshape(CH * S, *xmc.shape[2:]),
            ymc.reshape(CH * S, *ymc.shape[2:]),
            (Ho, Wo)).reshape(CH, S, Ho, Wo, 3)

    warped = jax.lax.map(chunk, (xm.reshape(n, CH, *xm.shape[1:]),
                                 ym.reshape(n, CH, *ym.shape[1:]),
                                 col.reshape(n, CH, *col.shape[1:])))
    warped = jnp.moveaxis(warped.reshape(Tm1, S, Ho, Wo, 3), 0, 1)
    return warped, final_state


fps_b2 = timeit(lambda: clip_deferred_chunked(variables, grayS, colorS_cf)[0],
                "B2 deferred-chunk12")

# Re-measure A to bound rig drift.
fps_a2 = timeit(lambda: engine.stabilize_clip(grayS, colorS)[0], "A again")

print(f"summary: A={fps_a:.1f}/{fps_a2:.1f}  B={fps_b:.1f}  B2={fps_b2:.1f}",
      flush=True)
