"""bench.py's multi-device batch leg, exercised on a virtual 8-CPU mesh.

On a multi-chip rig bench.py shards S streams per chip over the data mesh via
StreamEngine.stabilize_clips_sharded and reports frames/s/CHIP; this spawns
the real script tiny (env overrides) to prove that path compiles, runs, and
emits the incremental JSON headline contract the driver parses.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier

_TINY_ENV = dict(
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
    STABNET_BENCH_CONFIG="tiny",
    STABNET_BENCH_OUT="48,64",
    STABNET_BENCH_OUT2="32,48",   # second-geometry leg (1080p on the rig)
    STABNET_BENCH_S2="1",
    STABNET_BENCH_T="9",
    STABNET_BENCH_S="1",
    STABNET_BENCH_REPEATS="1",
    # CPU compiles under CI load can exceed the TPU-oriented defaults: give
    # both the init watchdog and the total deadline CI-sized budgets.
    STABNET_BENCH_WATCHDOG_S="1500",
    STABNET_BENCH_DEADLINE_S="1700",
)


def _run_bench(extra_env=None) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(_TINY_ENV)
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True, text=True, timeout=1800, env=env,
    )


def _check_complete_run(r: subprocess.CompletedProcess) -> None:
    assert r.returncode == 0, r.stderr[-2000:]

    # Driver contract: the headline JSON line on stdout, re-emitted after
    # each completed leg (the last is the most complete — that's the one the
    # driver's last-JSON-line parse picks up).  Key names carry the actual
    # measured configuration (48p, batch 1/chip here).
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) >= 1
    headline = json.loads(lines[-1])
    assert headline["metric"] == "stabilized_48p_throughput"
    assert headline["unit"] == "frames/s/chip"
    assert headline["value"] > 0
    # Every intermediate emission is itself a parseable, driver-valid line.
    for l in lines:
        h = json.loads(l)
        assert h["metric"] == "stabilized_48p_throughput"
        assert h["value"] > 0 and h["vs_baseline"] > 0

    # Secondary stats (stderr): the batch leg really ran on all 8 devices,
    # and the headline per-chip number is total/8.
    stats = json.loads([l for l in r.stderr.splitlines() if l.startswith("{")][-1])
    assert stats["n_devices"] == 8
    assert stats["fps_48p_batch_total"] > 0
    assert abs(stats["fps_48p_batch_total"] / 8
               - stats["fps_48p_batch1_per_chip"]) < 1e-6
    # The second-geometry leg, the pipelined serving leg, and the latency
    # decomposition all ran and made it into the stats line.
    assert stats["fps_32p_batch1_per_chip"] > 0
    assert headline["fps_32p_per_chip"] > 0
    assert stats["online_pipelined_wall_fps"] > 0
    for k in ("online_step_upload_p50_ms", "online_step_dispatch_p50_ms",
              "online_step_compute_readback_p50_ms"):
        assert stats[k] >= 0
    # Round-5 additions: the measured device-resident p50 (fenced step minus
    # the measured fence floor) and the FLOPs/MFU attribution.
    assert stats["online_latency_device_p50_ms"] >= 0
    assert stats["online_step_fence_floor_p50_ms"] >= 0
    assert headline["online_latency_device_p50_ms"] >= 0
    assert stats["flops_per_frame_g"] > 0
    assert stats["achieved_tflops_per_s_per_chip"] > 0
    assert 0 < stats["mfu_vs_bf16_peak"] < 1


def test_bench_runs_sharded_on_virtual_mesh():
    _check_complete_run(_run_bench())


def test_gate_legs_outrank_secondary_stats():
    # Leg priority (round-4 verdict #4): with only two measured legs allowed,
    # bench must spend them on the 720p headline and the 1080p GATE leg — not
    # on the single-stream/slope secondary stats.
    r = _run_bench({"STABNET_BENCH_MAX_LEGS": "2"})
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(
        [l for l in r.stderr.splitlines() if l.startswith("{")][-1])
    headline = json.loads(
        [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1])
    assert stats["fps_48p_batch1_per_chip"] > 0
    assert stats["fps_32p_batch1_per_chip"] > 0       # the gate leg ran...
    assert headline["fps_32p_per_chip"] > 0
    assert "fps_48p_single_stream" not in stats       # ...secondary did not
    assert "online_frame_latency_device_ms_slope" not in stats


def test_completed_legs_survive_retry_attempts(tmp_path):
    # Round-4 weakness: a retried run re-paid every leg.  Simulate: attempt A
    # measures only the first two legs (MAX_LEGS hook) under an explicit
    # shared deadline key; attempt B under the SAME key must restore them
    # (announcing it), then measure only the remaining legs.
    import time as _t

    ts = repr(_t.time() + 3600)
    ra = _run_bench({"STABNET_BENCH_MAX_LEGS": "2",
                     "STABNET_BENCH_DEADLINE_TS": ts})
    assert ra.returncode == 0, ra.stderr[-2000:]
    rb = _run_bench({"STABNET_BENCH_DEADLINE_TS": ts})
    assert rb.returncode == 0, rb.stderr[-2000:]
    assert "restored completed legs" in rb.stderr
    # The restored legs were NOT re-measured (no compile/measure marks for
    # them in attempt B) yet their values appear in B's final stats line.
    assert "leg 'batch' measured" not in rb.stderr
    assert "leg 'out2' measured" not in rb.stderr
    assert "leg 's1' measured" in rb.stderr
    _check_complete_run(rb)


def test_bench_lands_after_first_attempt_wedge():
    # The r03 failure mode, simulated: attempt 0 wedges in backend init (the
    # fake-wedge hook sleeps before the jax import), the watchdog fires, and
    # the retry wrapper must still land a COMPLETE parsed headline with rc=0
    # inside the same total deadline.
    r = _run_bench({
        "STABNET_BENCH_FAKE_WEDGE_ATTEMPTS": "0",
        # Per-attempt watchdog: 2s fuse for the wedged attempt 0, CI-sized
        # for the healthy retry (CPU init would not beat a 2s watchdog).
        "STABNET_BENCH_WATCHDOG_S": "2,1500",
        "STABNET_BENCH_RETRY_PAUSE_S": "0",
    })
    assert "wedged" in r.stderr and "retrying" in r.stderr
    _check_complete_run(r)
