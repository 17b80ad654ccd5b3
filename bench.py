"""Headline benchmark: online 720p stabilization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 500 stabilized 720p frames/s/chip
(BASELINE.md; the reference publishes no numbers of its own).

Measured path (throughput mode): whole-clip on-device scan — per frame, the
13-channel input is assembled from the device ring buffer, the ResNet-50-v2
regressor predicts the warp mesh, the multi-grid warp runs, the full-res 720p
color frame is warped, and the stabilized history feeds back — all without
host round-trips, exactly how batch stabilization deploys.  Frame-at-a-time
latency (which on this rig includes the host<->TPU tunnel RTT) is reported to
stderr as a secondary stat.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from stabnet_tpu.config import get_config
    from stabnet_tpu.data.synthetic import make_video
    from stabnet_tpu.models import init_variables, make_model
    from stabnet_tpu.stream import StreamEngine
    from stabnet_tpu.stream.video_io import to_gray_train

    cfg = get_config("v2_93")
    model = make_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))

    out_h, out_w = 720, 1280
    T = 121          # frames per clip (T-1 processed)
    repeats = 3

    uniq = make_video(8, out_h, out_w, seed=0, jitter=4.0)
    clip_color = uniq[np.arange(T) % 8][None]                      # (1, T, 720, 1280, 3)
    clip_gray = np.stack(
        [to_gray_train(f, cfg.height, cfg.width) for f in clip_color[0]]
    )[None]                                                        # (1, T, 288, 512)

    engine = StreamEngine(model, variables, cfg, out_hw=(out_h, out_w))

    # --- throughput: on-device whole-clip scan ---
    import jax.numpy as jnp

    g = jnp.asarray(clip_gray)
    c = jnp.asarray(clip_color)
    warped, state = engine.stabilize_clip(g, c)   # compile + warm
    warped.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(repeats):
        warped, state = engine.stabilize_clip(g, c)
    warped.block_until_ready()
    dt = time.perf_counter() - t0
    fps = (T - 1) * repeats / dt

    # --- latency: frame-at-a-time online path (includes host link) ---
    state1 = engine.init(clip_gray[:, 0])
    lat = []
    for i in range(1, 9):
        s = time.perf_counter()
        state1, out = engine.step(state1, clip_gray[:, i], clip_color[:, i])
        jax.block_until_ready(out.output_gray)
        lat.append(time.perf_counter() - s)
    lat_ms = np.asarray(lat[2:]) * 1e3

    stats = {
        "fps_720p_per_chip_devloop": fps,
        "frame_at_a_time_latency_p50_ms": float(np.percentile(lat_ms, 50)),
        "device": str(jax.devices()[0]),
        "frames_total": (T - 1) * repeats,
    }
    print(json.dumps(stats), file=sys.stderr)

    baseline_fps = 500.0
    print(json.dumps({
        "metric": "stabilized_720p_throughput",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline_fps, 4),
    }))


if __name__ == "__main__":
    main()
