"""Headline benchmark: online 720p stabilization throughput on one chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"} on
stdout — incrementally: the line is (re-)emitted after every completed leg,
so even a run cut short by the rig leaves the most recent complete headline
on stdout for the driver to parse.  Baseline: the north-star target of 500
stabilized 720p frames/s/chip (BASELINE.md; the reference publishes no
numbers of its own — its only perf artifact is the per-run fps print in
deploy_bundle.py:316-318, which always appears; this file is our equivalent
and must land under ALL failure modes of this rig).

Budget model (round-4 redesign after BENCH_r03.json landed rc=124/null):
the whole run operates under ONE total wall-clock deadline
(STABNET_BENCH_DEADLINE_S, default 480 s — inside the driver's kill window).
Legs run in headline-first order, each gated on the remaining budget; a
deadline-guard thread force-exits 0 at the deadline if at least one leg
landed (112 otherwise).  A wedged backend init aborts with a distinctive
exit code (113) and is retried in a fresh process only if the remaining
budget still covers a measurement.

Measured path (throughput mode): whole-clip on-device scan — per frame, the
13-channel input is assembled from the device ring buffer, the ResNet-50-v2
regressor predicts the warp mesh, the multi-grid warp runs, the full-res 720p
color frame is warped, and the stabilized history feeds back — all without
host round-trips, exactly how batch stabilization deploys.  Frame-at-a-time
latency (which on this rig includes the host<->TPU tunnel RTT) is reported to
stderr as a secondary stat.
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

# Distinctive exit codes shared between the child attempts and the retry
# wrapper (a bare `3` could collide with a library abort — ADVICE r3).
WATCHDOG_EXIT_CODE = 113       # backend init wedged; a fresh attempt may work
NO_MEASUREMENT_EXIT_CODE = 112  # total deadline hit before any leg completed
TRANSIENT_INIT_EXIT_CODE = 114  # backend came up but the first fetch failed
                                # (post-wedge FAILED_PRECONDITION / UNAVAILABLE
                                # release transient — BASELINE.md rig notes);
                                # a fresh client connection usually works

_BASELINE_FPS = 500.0


def _deadline_ts() -> float:
    """Absolute wall-clock deadline, shared across retry attempts via env.

    STABNET_BENCH_DEADLINE_S <= 0 disables the budget entirely (directly
    attached rigs / interactive runs).
    """
    ts = os.environ.get("STABNET_BENCH_DEADLINE_TS")
    if ts:
        return float(ts)
    budget = float(os.environ.get("STABNET_BENCH_DEADLINE_S", "480"))
    return float("inf") if budget <= 0 else time.time() + budget


def _arm_deadline_guard(deadline: float, state: dict):
    """Force a clean exit at the total deadline instead of being timeout-killed.

    The guard runs in a daemon thread, so it fires even while the main thread
    is blocked inside a wedged backend RPC.  If at least one leg completed
    (state["emitted"]) the run exits 0 — its most recent headline line is
    already on stdout; otherwise it exits NO_MEASUREMENT_EXIT_CODE so the
    retry wrapper can decide whether a fresh attempt still fits the budget.
    """
    if deadline == float("inf"):
        return

    def watch():
        while True:
            rem = deadline - time.time()
            if rem <= 0:
                break
            time.sleep(min(rem, 5.0))
        if state.get("emitted"):
            sys.stderr.write(
                "bench: total deadline reached — exiting with the legs "
                "measured so far\n")
            sys.stderr.flush()
            os._exit(0)
        sys.stderr.write("bench: total deadline reached before any "
                         "measurement completed\n")
        sys.stderr.flush()
        os._exit(NO_MEASUREMENT_EXIT_CODE)

    threading.Thread(target=watch, daemon=True).start()


def _persist_path(deadline: float):
    """Per-run leg-result carryover file, shared across retry attempts.

    Keyed by the ABSOLUTE deadline timestamp (the one value every attempt of
    one bench run shares via STABNET_BENCH_DEADLINE_TS), so a retried attempt
    resumes from the completed legs instead of re-paying them — the round-4
    weakness where a retry re-measured everything and the budget's tail never
    reached the 1080p gate leg.  No deadline (interactive/direct rigs) means
    no carryover is needed.
    """
    if deadline == float("inf"):
        return None
    return os.path.join(tempfile.gettempdir(),
                        f"stabnet_bench_legs_{deadline:.0f}.json")


def _load_legs(path) -> dict:
    if path and os.path.exists(path):
        try:
            with open(path) as f:
                saved = json.load(f)
            if isinstance(saved.get("legs"), list):
                return saved
        except (OSError, ValueError):
            pass  # a torn write from a force-exited attempt: start clean
    return {"legs": [], "stats": {}, "headline": {}}


def _save_legs(path, legs, stats, headline) -> None:
    if not path:
        return
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump({"legs": sorted(legs), "stats": stats,
                   "headline": headline}, f)
    os.replace(tmp, path)  # atomic: a force-exit mid-save can't tear the file


def _arm_init_watchdog(seconds: float = 150.0):
    """Abort (honestly, loudly) if backend init wedges instead of hanging forever.

    The axon TPU tunnel on this rig can wedge such that even `jax.devices()`
    blocks indefinitely (observed after a client process died mid-RPC).  A
    benchmark that never returns is worse than one that reports the failure:
    the watchdog fires only if the first device computation hasn't completed
    within `seconds`, prints a diagnostic, and exits WATCHDOG_EXIT_CODE.  It
    is disarmed the moment the backend responds; it never affects a healthy
    run.
    """
    armed = threading.Event()
    if seconds <= 0:        # explicit disable (e.g. directly-attached rigs)
        return armed

    def watch():
        if not armed.wait(seconds):
            print(
                f"bench: backend init did not complete within {seconds:.0f}s "
                "— TPU tunnel appears wedged; no measurement taken",
                file=sys.stderr, flush=True,
            )
            os._exit(WATCHDOG_EXIT_CODE)

    threading.Thread(target=watch, daemon=True).start()
    return armed


def main():
    deadline = _deadline_ts()
    state = {"emitted": False}
    _arm_deadline_guard(deadline, state)

    def remaining() -> float:
        return deadline - time.time()

    # Test hook: cap how many legs this attempt may MEASURE (restored legs
    # don't count) — lets CI pin the leg priority order without fragile
    # wall-clock staging.
    max_legs = int(os.environ.get("STABNET_BENCH_MAX_LEGS", "99"))
    measured_legs = [0]

    def fits(leg: str, est_s: float) -> bool:
        if measured_legs[0] >= max_legs:
            print(f"bench: skipping leg '{leg}' — "
                  f"STABNET_BENCH_MAX_LEGS={max_legs} reached",
                  file=sys.stderr, flush=True)
            return False
        if remaining() >= est_s:
            return True
        print(f"bench: skipping leg '{leg}' — needs ~{est_s:.0f}s, "
              f"{max(remaining(), 0):.0f}s left in the budget",
              file=sys.stderr, flush=True)
        return False

    # The init watchdog never needs more budget than the deadline leaves
    # after a minimal measurement (~120 s for init + the headline leg).
    # A comma list gives per-attempt values (test hook: a short fuse for the
    # simulated-wedge attempt, a CI-sized one for the healthy retry).
    # Attempt 0 waits long: observed wedges release while the client WAITS
    # (276 s and 408 s recoveries, 2026-08-20), whereas force-exiting mid-RPC
    # renews the dead-session claim (BASELINE.md rig notes) — so one patient
    # wait beats abort+retry; the deadline-derived cap below trims it to
    # what the budget can afford.  The retry attempt keeps a short fuse.
    wd_parts = os.environ.get("STABNET_BENCH_WATCHDOG_S", "360,150").split(",")
    attempt = int(os.environ.get("STABNET_BENCH_ATTEMPT", "0"))
    watchdog_s = float(wd_parts[min(attempt, len(wd_parts) - 1)])
    if deadline != float("inf") and watchdog_s > 0:
        watchdog_s = min(watchdog_s, max(10.0, remaining() - 120.0))
    watchdog_disarm = _arm_init_watchdog(watchdog_s)

    # Test hook: simulate the rig's wedged-tunnel init on selected attempts
    # ("0" = first).  Sleeps BEFORE backend init so the watchdog must fire.
    fake = os.environ.get("STABNET_BENCH_FAKE_WEDGE_ATTEMPTS")
    if fake and os.environ.get("STABNET_BENCH_ATTEMPT", "0") in fake.split(","):
        time.sleep(3600)

    import jax

    # The axon TPU plugin force-installs jax_platforms="axon,cpu", overriding
    # the JAX_PLATFORMS env var; honor an explicit env request (the CI test
    # runs this script on the virtual CPU mesh) via jax.config, which wins.
    # keep_cpu preserves a host backend for determinism-pinned paths.
    from stabnet_tpu.utils import honor_jax_platforms_env

    honor_jax_platforms_env(keep_cpu=True)

    from stabnet_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    t_start = time.time()

    def mark(phase: str) -> None:
        # Phase timestamps on stderr: when a deadline exit truncates the run,
        # the artifact's tail shows where the budget went (init vs compile vs
        # measurement) instead of a bare rc.
        print(f"bench: +{time.time() - t_start:.0f}s {phase}",
              file=sys.stderr, flush=True)

    from stabnet_tpu.config import get_config
    from stabnet_tpu.data.synthetic import make_video
    from stabnet_tpu.models import init_variables, make_model
    from stabnet_tpu.stream import StreamEngine
    from stabnet_tpu.stream.video_io import to_gray_train

    import jax.numpy as jnp

    cfg = get_config(os.environ.get("STABNET_BENCH_CONFIG", "v2_93"))
    model = make_model(cfg)
    try:
        # Test hook: simulate the post-wedge release transient on selected
        # attempts (mirrors STABNET_BENCH_FAKE_WEDGE_ATTEMPTS above).
        fake_tr = os.environ.get("STABNET_BENCH_FAKE_TRANSIENT_ATTEMPTS")
        if fake_tr and os.environ.get("STABNET_BENCH_ATTEMPT",
                                      "0") in fake_tr.split(","):
            raise jax.errors.JaxRuntimeError(
                "FAILED_PRECONDITION: simulated release transient")
        variables = init_variables(model, cfg, jax.random.PRNGKey(0))
        # First real device computation done -> the backend is alive; disarm.
        float(jnp.sum(jax.tree_util.tree_leaves(variables)[0]))
    except jax.errors.JaxRuntimeError as e:
        # Post-wedge release transient: the backend enumerates, init returns,
        # but the first fetch dies with FAILED_PRECONDITION / UNAVAILABLE
        # (observed 2026-08-20 right after a 408 s wedge released).  A fresh
        # client connection usually succeeds — hand the distinctive code to
        # the retry wrapper instead of crashing the artifact to rc=1.
        print(f"bench: backend init failed with a transient error: {e}",
              file=sys.stderr, flush=True)
        sys.exit(TRANSIENT_INIT_EXIT_CODE)
    watchdog_disarm.set()
    mark("backend alive (init fence done)")
    # Production-magnitude warp field (the engine's tile-window guard and its
    # wide tiers stay live in the measured path, so out-of-window handling is
    # still part of what is being timed).
    from stabnet_tpu.models import scale_theta_head
    variables = scale_theta_head(variables)

    # Defaults are the headline configuration; the env overrides exist so the
    # multi-device code path below is exercisable on a virtual CPU mesh in CI
    # (tests/test_bench_multidev.py) without a 720p-on-CPU run.
    out_h, out_w = (int(v) for v in
                    os.environ.get("STABNET_BENCH_OUT", "720,1280").split(","))
    T = int(os.environ.get("STABNET_BENCH_T", "61"))    # frames/clip (T-1 processed)
    assert T >= 9, "need >= 9 frames for the slope and latency legs"
    # S=6 measured best at 720p too (round-4 sweep, twice, scripts/s_sweep.py):
    # 877/879 fps/chip vs 747 at S=8, 869/864 at S=7, 831 at S=5, 834-839 at
    # S=4, 590 at S=10 — monotone falloff both sides of 6.  BASELINE.md round 4.
    S = int(os.environ.get("STABNET_BENCH_S", "6"))     # streams per chip, batch mode
    repeats = int(os.environ.get("STABNET_BENCH_REPEATS", "2"))

    # On a multi-chip rig the batch leg shards S streams per chip over the
    # data mesh (parameters replicated, clip axis split — zero steady-state
    # collectives); the headline number stays frames/s/CHIP.  Single-chip
    # behavior is byte-identical to before.
    n_dev = len(jax.devices())

    uniq = make_video(8, out_h, out_w, seed=0, jitter=4.0)
    color1 = uniq[np.arange(T) % 8][None]                          # (1, T, 720, 1280, 3)
    gray1 = np.stack(
        [to_gray_train(f, cfg.height, cfg.width) for f in color1[0]]
    )[None]                                                        # (1, T, 288, 512)
    S_total = S * n_dev
    colorS = np.broadcast_to(color1, (S_total,) + color1.shape[1:]).copy()
    grayS = np.broadcast_to(gray1, (S_total,) + gray1.shape[1:]).copy()

    mark("inputs prepared")
    engine = StreamEngine(model, variables, cfg, out_hw=(out_h, out_w))

    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from stabnet_tpu.parallel import data_mesh
        mesh = data_mesh()
        batch_sharding = NamedSharding(mesh, P(cfg.mesh_data_axis))

        def run_batch(g, c):
            return engine.stabilize_clips_sharded(g, c, mesh=mesh)
    else:
        run_batch, batch_sharding = None, None  # single chip: plain path

    def fence(arrs):
        return float(jnp.sum(arrs[0][:, -1, ::97, ::119, 0].astype(jnp.int32)))

    def run_clip(g, c):
        warped, state = engine.stabilize_clip(g, c)
        return warped, state

    def measure(g, c, label, run=None, sharding=None):
        # Commit inputs up front (so upload isn't in the timed window) — with
        # the shard sharding for the multi-chip leg: committing S*n_dev 720p
        # clips to device 0 first would overflow one chip's HBM.
        run = run or run_clip
        put = ((lambda a: jax.device_put(a, sharding))
               if sharding is not None else jnp.asarray)
        g = put(g)
        c = put(c)
        w, _ = run(g, c)          # compile + warm
        fence((w,))
        mark(f"leg '{label}' compiled + warm")
        t0 = time.perf_counter()
        for _ in range(repeats):
            w, _ = run(g, c)
        fence((w,))
        dt = time.perf_counter() - t0
        mark(f"leg '{label}' measured")
        frames = g.shape[0] * (g.shape[1] - 1) * repeats
        return frames / dt

    # ---- Incremental headline + stats emission ------------------------------
    # Key names reflect the ACTUAL measured configuration so archived bench
    # artifacts from non-default env overrides can't masquerade as the
    # headline batch-8 720p numbers.
    headline = {
        "metric": f"stabilized_{out_h}p_throughput",
        "value": None,
        "unit": "frames/s/chip",
        "vs_baseline": None,
    }
    stats = {"device": str(jax.devices()[0]), "n_devices": n_dev}

    # Carryover from earlier attempts of the SAME deadline-keyed run: a
    # retried attempt keeps every already-measured leg (its values and its
    # place in the headline) and only measures what's left.
    persist_path = _persist_path(deadline)
    saved = _load_legs(persist_path)
    done = set(saved["legs"])
    if done:
        for k, v in saved["stats"].items():
            stats.setdefault(k, v)
        for k, v in saved["headline"].items():
            if headline.get(k) is None and v is not None:
                headline[k] = v
        print(f"bench: restored completed legs from a previous attempt: "
              f"{sorted(done)}", file=sys.stderr, flush=True)

    def emit():
        # Headline on stdout (the driver parses the last/most complete one),
        # full stats on stderr.  Both flushed so a later forced exit — guard
        # thread or external kill — can't lose what is already measured.
        print(json.dumps(stats), file=sys.stderr, flush=True)
        print(json.dumps(headline), flush=True)
        state["emitted"] = True

    def leg_done(name: str) -> None:
        done.add(name)
        measured_legs[0] += 1
        _save_legs(persist_path, done, stats, headline)

    if done and headline["value"] is not None:
        emit()  # the restored headline is on stdout before any new leg runs

    # Leg order is GATE-first (round-4 verdict: a slow init once ate the
    # budget's tail and the 1080p ≥500-fps gate leg never ran while two
    # secondary slope legs did): 720p headline batch → 1080p gate batch →
    # single-stream + slope → online latency → pipelined serving.

    # ---- Leg 1 (headline): 720p batch throughput ---------------------------
    if "batch" not in done and fits("batch", 120):
        fps_batch_total = measure(grayS, colorS, "batch", run=run_batch,
                                  sharding=batch_sharding)
        fps_batch = fps_batch_total / n_dev
        stats[f"fps_{out_h}p_batch{S}_per_chip"] = fps_batch
        if n_dev > 1:
            stats[f"fps_{out_h}p_batch_total"] = fps_batch_total
        headline["value"] = round(fps_batch, 2)
        headline["vs_baseline"] = round(fps_batch / _BASELINE_FPS, 4)
        # FLOPs / MFU attribution — makes future fps regressions
        # attributable to utilization vs clock/overhead shifts.  The MFU
        # basis is a DETERMINISTIC analytic net-FLOPs estimate (ResNet-50-v2
        # forward ~4.1 GFLOP at 224x224x3, linear in pixels, plus the extra
        # input channels' share of the 7x7/2 stem) — a LOWER bound: it
        # excludes the warp kernels' MXU work.  XLA's own cost analysis is
        # emitted alongside when the backend provides one, but it is not
        # trusted as the MFU basis: measured on the v5e plugin it reports
        # 0.40 GFLOP/frame for this program (convolutions uncounted,
        # optimal_seconds negative).  bf16 peak denominator; v5e = 197
        # TFLOP/s (override STABNET_BENCH_PEAK_TFLOPS on other generations).
        px_ratio = (cfg.height * cfg.width) / (224.0 * 224.0)
        net_gflop = (4.1 + 0.236 * (cfg.in_channels - 3) / 3.0) * px_ratio
        peak = float(os.environ.get("STABNET_BENCH_PEAK_TFLOPS", "197"))
        achieved = fps_batch * net_gflop / 1e3
        stats["flops_per_frame_g"] = round(net_gflop, 4)
        # Rounding keeps full signal at both scales: ~13 TFLOP/s on the
        # TPU rig, ~1e-4 on CI's tiny virtual-mesh run.
        stats["achieved_tflops_per_s_per_chip"] = round(achieved, 7)
        stats["mfu_vs_bf16_peak"] = round(achieved / peak, 9)
        try:
            lowered = engine._clip.lower(
                variables,
                jax.ShapeDtypeStruct(grayS[:S].shape, grayS.dtype),
                jax.ShapeDtypeStruct(colorS[:S].shape, colorS.dtype),
            )
            cost = lowered.cost_analysis()
            if cost is None:
                # Some backends (the axon TPU plugin among them) only
                # implement cost analysis on the COMPILED module; the batch
                # leg already compiled this exact program, and the
                # persistent compile cache makes this a lookup, not a build.
                cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            stats["flops_per_frame_g_xla"] = round(
                float(cost["flops"]) / (S * (T - 1)) / 1e9, 4)
        except Exception as e:  # backend cost analysis is advisory
            print(f"bench: cost_analysis unavailable ({e!r})",
                  file=sys.stderr, flush=True)
        emit()
        leg_done("batch")
    fps_batch = stats.get(f"fps_{out_h}p_batch{S}_per_chip")

    # ---- Leg 2 (second gate): second output geometry (default 1080p) -------
    # Same model, second engine at the other full-res warp size, batch mode,
    # per chip.  Empty STABNET_BENCH_OUT2 disables it — CI's tiny CPU run does.
    out2 = os.environ.get("STABNET_BENCH_OUT2", "1080,1920")
    if out2 and "out2" not in done and fits("out2", 110):
        out2_h, out2_w = (int(v) for v in out2.split(","))
        # S=6 measured best at 1080p: 527.9 fps/chip vs 501.2 at S=4 and a
        # wash at S=8 (warp scales linearly; S=6 amortizes the per-step model
        # cost without the S=8 HBM pressure).  BASELINE.md round 3.
        S2 = int(os.environ.get("STABNET_BENCH_S2", "6"))
        color2 = make_video(8, out2_h, out2_w, seed=0, jitter=4.0)[
            np.arange(T) % 8][None]
        gray2 = np.stack(
            [to_gray_train(f, cfg.height, cfg.width) for f in color2[0]]
        )[None]
        colorS2 = np.broadcast_to(color2, (S2,) + color2.shape[1:]).copy()
        grayS2 = np.broadcast_to(gray2, (S2,) + gray2.shape[1:]).copy()
        engine2 = StreamEngine(model, variables, cfg, out_hw=(out2_h, out2_w))

        def run_clip2(g, c):
            return engine2.stabilize_clip(g, c)

        fps2 = measure(grayS2, colorS2, "out2", run=run_clip2)
        stats[f"fps_{out2_h}p_batch{S2}_per_chip"] = fps2
        headline[f"fps_{out2_h}p_per_chip"] = round(fps2, 2)
        emit()
        leg_done("out2")

    # ---- Leg 3: single-stream throughput (also feeds the slope leg) --------
    if "single_stream" not in done and fits("single_stream", 70):
        fps_s1 = measure(gray1, color1, "s1")
        stats[f"fps_{out_h}p_single_stream"] = fps_s1
        best = max(v for v in (fps_s1, fps_batch) if v is not None)
        headline["value"] = round(best, 2)
        headline["vs_baseline"] = round(best / _BASELINE_FPS, 4)
        emit()
        leg_done("single_stream")
    fps_s1 = stats.get(f"fps_{out_h}p_single_stream")

    # ---- Leg 4: device-side per-frame latency by the SLOPE method ----------
    # Time the single-stream whole-clip scan at two clip lengths and divide
    # the delta by the extra frames.  Fixed costs (dispatch, the host<->TPU
    # tunnel RTT on this rig, fence readback) cancel; what remains is the
    # marginal device time per online frame — the number that applies on
    # directly-attached hardware (<10 ms p50 north star, BASELINE.md).
    if (fps_s1 is not None and "latency_slope" not in done
            and fits("latency_slope", 50)):
        T_short = max(2, min(21, T // 3 + 2, T - 1))
        fps_short = measure(gray1[:, :T_short], color1[:, :T_short], "s1short")
        t_long = (T - 1) * repeats / fps_s1
        t_short = (T_short - 1) * repeats / fps_short
        device_ms = (t_long - t_short) / ((T - T_short) * repeats) * 1e3
        stats["online_frame_latency_device_ms_slope"] = round(device_ms, 3)
        headline["online_latency_device_ms"] = round(device_ms, 3)
        emit()
        leg_done("latency_slope")

    # ---- Leg 5: frame-at-a-time online latency + decomposition -------------
    # Includes the host<->device link; on the CI rig that link is a tunnel
    # with ~26 ms RTT, so this is an upper bound.  The decomposition splits
    # it into upload / dispatch / compute+readback so the tunnel's share is
    # visible (on directly-attached rigs the copies ride PCIe/DMA).
    if "online_latency" not in done and fits("online_latency", 60):
        state1 = engine.init(gray1[:, 0])
        lat = []
        for i in range(1, 9):
            s = time.perf_counter()
            state1, out = engine.step(state1, gray1[:, i], color1[:, i])
            _ = float(jnp.sum(out.black[:, ::97, ::119]))
            lat.append(time.perf_counter() - s)
        lat_ms = np.asarray(lat[2:]) * 1e3

        up_ms, disp_ms, read_ms = [], [], []
        for i in range(1, 9):
            s = time.perf_counter()
            g = jax.block_until_ready(jax.device_put(gray1[:, i]))
            c = jax.block_until_ready(jax.device_put(color1[:, i]))
            t1 = time.perf_counter()
            state1, out = engine.step(state1, g, c)
            t2 = time.perf_counter()
            _ = np.asarray(out.warped_color[0])
            t3 = time.perf_counter()
            up_ms.append((t1 - s) * 1e3)
            disp_ms.append((t2 - t1) * 1e3)
            read_ms.append((t3 - t2) * 1e3)

        # MEASURED per-step p50 with device-resident inputs (round-4 verdict:
        # the <10 ms gate needs a measured p50, not slope + bandwidth math).
        # Each step is fenced by a scalar readback; the separately measured
        # fence floor — dispatch + scalar RTT of a trivial jitted op — is the
        # link's share, so (fenced − floor) is a per-step device+dispatch
        # latency that is a measurement, not an extrapolation.  On directly-
        # attached rigs the floor is ~0.1 ms and raw ≈ device.
        g_res = [jax.block_until_ready(jax.device_put(gray1[:, i]))
                 for i in range(1, 9)]
        c_res = [jax.block_until_ready(jax.device_put(color1[:, i]))
                 for i in range(1, 9)]
        noop = jax.jit(lambda v: v + 1.0)
        z = jnp.zeros(())
        float(noop(z))  # compile outside the timed floor
        floor = []
        for _ in range(12):
            s = time.perf_counter()
            float(noop(z))
            floor.append(time.perf_counter() - s)
        fenced = []
        for i in range(8):
            s = time.perf_counter()
            state1, out = engine.step(state1, g_res[i], c_res[i])
            _ = float(jnp.sum(out.black[:, ::97, ::119]))
            fenced.append(time.perf_counter() - s)
        fenced_ms = np.asarray(fenced[1:]) * 1e3
        floor_ms = np.asarray(floor[2:]) * 1e3
        floor_p50 = float(np.percentile(floor_ms, 50))
        dev_p50 = max(float(np.percentile(fenced_ms, 50)) - floor_p50, 0.0)
        dev_p90 = max(float(np.percentile(fenced_ms, 90))
                      - float(np.percentile(floor_ms, 90)), 0.0)
        stats["online_step_device_resident_fenced_p50_ms"] = round(
            float(np.percentile(fenced_ms, 50)), 2)
        stats["online_step_fence_floor_p50_ms"] = round(floor_p50, 2)
        stats["online_latency_device_p50_ms"] = round(dev_p50, 2)
        stats["online_latency_device_p90_ms"] = round(dev_p90, 2)

        stats["online_step_latency_wall_p50_ms"] = float(
            np.percentile(lat_ms, 50))
        stats["online_step_upload_p50_ms"] = round(
            float(np.percentile(up_ms, 50)), 2)
        stats["online_step_dispatch_p50_ms"] = round(
            float(np.percentile(disp_ms, 50)), 2)
        stats["online_step_compute_readback_p50_ms"] = round(
            float(np.percentile(read_ms, 50)), 2)
        headline["online_latency_wall_p50_ms"] = round(
            float(np.percentile(lat_ms, 50)), 1)
        headline["online_latency_device_p50_ms"] = round(dev_p50, 2)
        emit()
        leg_done("online_latency")

    # ---- Leg 6: pipelined single-stream serving -----------------------------
    # StreamDriver's production default: read frame t-1's output only after
    # dispatching step t, so JAX's async dispatch overlaps upload/compute/
    # readback across adjacent frames.
    if "pipelined" not in done and fits("pipelined", 40):
        state1 = engine.init(gray1[:, 0])
        pend = None
        t0 = time.perf_counter()
        for i in range(1, T):
            state1, out = engine.step(state1, gray1[:, i], color1[:, i])
            if pend is not None:
                _ = np.asarray(pend.warped_color[0])
            pend = out
        _ = np.asarray(pend.warped_color[0])
        fps_pipelined = (T - 1) / (time.perf_counter() - t0)
        stats["online_pipelined_wall_fps"] = round(fps_pipelined, 1)
        headline["online_pipelined_wall_fps"] = round(fps_pipelined, 1)
        emit()
        leg_done("pipelined")

    if not state["emitted"]:
        print("bench: no leg fit the remaining budget", file=sys.stderr,
              flush=True)
        sys.exit(NO_MEASUREMENT_EXIT_CODE)


def _main_with_retries():
    """Bounded re-attempts around a wedged-backend abort, inside ONE deadline.

    The watchdog turns a wedged TPU tunnel into a loud WATCHDOG_EXIT_CODE
    (see _arm_init_watchdog), and the observed wedge often releases within
    minutes (BASELINE.md rig notes) — so the benchmark artifact is worth a
    second try, but only when the TOTAL budget still covers init plus at
    least the headline leg.  The measurement must run in a FRESH process
    (the blocked first attempt can't recover in-process: its thread is stuck
    inside backend init), so the parent relaunches itself with
    STABNET_BENCH_CHILD=1, passing the shared absolute deadline via
    STABNET_BENCH_DEADLINE_TS.  Any other exit (success, real crash) passes
    straight through.  STABNET_BENCH_ATTEMPTS=1 disables retries.
    """
    # 3 attempts covers the observed wedge -> release-transient -> healthy
    # sequence; the shared deadline (not the count) bounds total wall time.
    attempts = max(1, int(os.environ.get("STABNET_BENCH_ATTEMPTS", "3")))
    if os.environ.get("STABNET_BENCH_CHILD") or attempts == 1:
        main()
        return
    deadline = _deadline_ts()
    # Init (~30 s healthy) + the headline batch leg (~90 s incl. compile).
    min_retry_budget = float(os.environ.get("STABNET_BENCH_MIN_RETRY_S", "150"))
    env = dict(os.environ, STABNET_BENCH_CHILD="1")
    if deadline != float("inf"):
        env["STABNET_BENCH_DEADLINE_TS"] = repr(deadline)
    rc = 0
    for i in range(attempts):
        env["STABNET_BENCH_ATTEMPT"] = str(i)
        rc = subprocess.call([sys.executable, os.path.abspath(__file__)],
                             env=env)
        if rc not in (WATCHDOG_EXIT_CODE, NO_MEASUREMENT_EXIT_CODE,
                      TRANSIENT_INIT_EXIT_CODE):
            sys.exit(rc)
        left = deadline - time.time()
        if i + 1 >= attempts or left < min_retry_budget:
            break
        # A release transient clears in seconds; a wedge needs the long pause.
        default_pause = "5" if rc == TRANSIENT_INIT_EXIT_CODE else "60"
        pause = min(float(os.environ.get("STABNET_BENCH_RETRY_PAUSE_S",
                                         default_pause)),
                    max(0.0, left - min_retry_budget))
        why = ("hit a transient backend-init error"
               if rc == TRANSIENT_INIT_EXIT_CODE else "hit the init watchdog")
        print(f"bench: attempt {i + 1}/{attempts} {why}; "
              f"retrying in {pause:.0f}s ({left:.0f}s of budget left)",
              file=sys.stderr, flush=True)
        time.sleep(pause)
    sys.exit(rc)


if __name__ == "__main__":
    _main_with_retries()
