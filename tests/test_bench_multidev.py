"""bench.py's multi-device batch leg, exercised on a virtual 8-CPU mesh.

On a multi-chip rig bench.py shards S streams per chip over the data mesh via
StreamEngine.stabilize_clips_sharded and reports frames/s/CHIP; this spawns
the real script tiny (env overrides) to prove that path compiles, runs, and
emits the one-line JSON contract the driver parses.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier


def test_bench_runs_sharded_on_virtual_mesh():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        STABNET_BENCH_CONFIG="tiny",
        STABNET_BENCH_OUT="48,64",
        STABNET_BENCH_OUT2="32,48",   # second-geometry leg (1080p on the rig)
        STABNET_BENCH_S2="1",
        STABNET_BENCH_T="9",
        STABNET_BENCH_S="1",
        STABNET_BENCH_REPEATS="1",
        # CPU compiles under CI load can exceed the TPU-wedge watchdog default.
        STABNET_BENCH_WATCHDOG_S="1500",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # Driver contract: ONE JSON line on stdout.  Key names carry the actual
    # measured configuration (48p, batch 1/chip here).
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    headline = json.loads(lines[0])
    assert headline["metric"] == "stabilized_48p_throughput"
    assert headline["unit"] == "frames/s/chip"
    assert headline["value"] > 0

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
