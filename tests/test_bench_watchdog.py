"""bench.py failure-mode machinery: init watchdog, total deadline, retries.

Round 3's bench artifact landed rc=124/null because the recovery machinery
itself (600s watchdog + 120s pause + 600s retry) outlived the driver's kill
window.  Round 4 restructured bench.py around ONE total deadline; these
tests pin the deadline math without touching a backend.
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(body: str, env=None) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", f"import sys; sys.path.insert(0, {_REPO!r})\n" + body],
        capture_output=True, text=True, timeout=60,
        env=dict(os.environ, **(env or {})),
    )


def _run_bench(env) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, **env),
    )


def test_zero_disables():
    r = _run(
        "import bench, time\n"
        "bench._arm_init_watchdog(0.0)\n"
        "time.sleep(2)\n"
        "print('survived')\n"
    )
    assert r.returncode == 0
    assert "survived" in r.stdout


def test_fires_when_never_disarmed():
    r = _run(
        "import bench, time\n"
        "bench._arm_init_watchdog(1.0)\n"
        "time.sleep(8)\n"
        "print('unreachable')\n"
    )
    assert r.returncode == 113  # bench.WATCHDOG_EXIT_CODE — distinctive
    assert "wedged" in r.stderr
    assert "unreachable" not in r.stdout


def test_silent_when_disarmed():
    r = _run(
        "import bench, time\n"
        "bench._arm_init_watchdog(1.0).set()\n"
        "time.sleep(2)\n"
        "print('survived')\n"
    )
    assert r.returncode == 0
    assert "survived" in r.stdout


def test_retry_wrapper_relaunches_on_watchdog_abort():
    # A simulated wedge on EVERY attempt (the fake-wedge hook sleeps before
    # backend init) makes each child exit WATCHDOG_EXIT_CODE; with budget to
    # spare the parent must retry (announcing it) and only then give up.
    env = dict(
        JAX_PLATFORMS="cpu",
        STABNET_BENCH_WATCHDOG_S="0.5",
        STABNET_BENCH_ATTEMPTS="2",
        STABNET_BENCH_RETRY_PAUSE_S="0",
        STABNET_BENCH_DEADLINE_S="600",
        STABNET_BENCH_FAKE_WEDGE_ATTEMPTS="0,1",
    )
    r = _run_bench(env)
    assert r.returncode == 113
    assert "retrying" in r.stderr
    assert r.stderr.count("wedged") == 2  # both attempts fired the watchdog


def test_no_retry_when_budget_spent():
    # Same wedge, but the total deadline leaves less than the minimum retry
    # budget after the first abort: the parent must give up immediately
    # (ONE watchdog fire, no "retrying") instead of burning the driver's
    # window on a doomed second attempt — the exact r03 failure.
    env = dict(
        JAX_PLATFORMS="cpu",
        STABNET_BENCH_WATCHDOG_S="0.5",
        STABNET_BENCH_ATTEMPTS="2",
        STABNET_BENCH_RETRY_PAUSE_S="0",
        STABNET_BENCH_DEADLINE_S="30",   # < watchdog + MIN_RETRY_S after abort
        STABNET_BENCH_MIN_RETRY_S="150",
        STABNET_BENCH_FAKE_WEDGE_ATTEMPTS="0,1",
    )
    r = _run_bench(env)
    assert r.returncode == 113
    assert "retrying" not in r.stderr
    assert r.stderr.count("wedged") == 1


def test_retry_wrapper_relaunches_on_release_transient():
    # Post-wedge release transient (FAILED_PRECONDITION on the first fetch,
    # observed 2026-08-20): the child exits TRANSIENT_INIT_EXIT_CODE instead
    # of crashing to rc=1, and the parent retries after a SHORT pause.  Both
    # attempts transient here, so the wrapper ends on the distinctive code.
    env = dict(
        JAX_PLATFORMS="cpu",
        STABNET_BENCH_ATTEMPTS="2",
        STABNET_BENCH_RETRY_PAUSE_S="0",
        STABNET_BENCH_DEADLINE_S="600",
        STABNET_BENCH_FAKE_TRANSIENT_ATTEMPTS="0,1",
    )
    r = _run_bench(env)
    assert r.returncode == 114  # bench.TRANSIENT_INIT_EXIT_CODE
    assert "transient" in r.stderr
    assert "retrying" in r.stderr
    assert r.stderr.count("transient error") == 2


def test_deadline_guard_exits_zero_with_partial_results():
    # Once any leg has emitted a headline, hitting the total deadline must be
    # a CLEAN rc=0 exit (the driver parses the already-printed line), even
    # while the main thread is blocked (simulated by a long sleep).
    r = _run(
        "import bench, json, sys, time\n"
        "state = {'emitted': False}\n"
        "bench._arm_deadline_guard(time.time() + 1.0, state)\n"
        "print(json.dumps({'metric': 'stabilized_720p_throughput',"
        " 'value': 1.0, 'unit': 'frames/s/chip', 'vs_baseline': 0.002}),"
        " flush=True)\n"
        "state['emitted'] = True\n"
        "time.sleep(30)\n"
        "print('unreachable')\n"
    )
    assert r.returncode == 0
    assert "deadline reached" in r.stderr
    headline = json.loads(r.stdout.strip().splitlines()[-1])
    assert headline["metric"] == "stabilized_720p_throughput"
    assert "unreachable" not in r.stdout


def test_deadline_guard_exits_112_without_results():
    r = _run(
        "import bench, time\n"
        "bench._arm_deadline_guard(time.time() + 1.0, {'emitted': False})\n"
        "time.sleep(30)\n"
    )
    assert r.returncode == 112  # bench.NO_MEASUREMENT_EXIT_CODE
    assert "before any measurement" in r.stderr


def test_watchdog_shrinks_to_fit_deadline():
    # With only ~25s of budget left, the child must not arm a 150s watchdog:
    # the wedge has to be detected inside the remaining window.  (Direct
    # child invocation; the deadline is passed the way the parent passes it.)
    t0 = time.time()
    env = dict(
        JAX_PLATFORMS="cpu",
        STABNET_BENCH_CHILD="1",
        STABNET_BENCH_DEADLINE_TS=repr(time.time() + 25.0),
        STABNET_BENCH_FAKE_WEDGE_ATTEMPTS="0",
    )
    r = _run_bench(env)
    took = time.time() - t0
    # Either the (shrunk-to-10s-floor) watchdog fired or the deadline guard
    # did; both are honest bounded exits well inside the old 600s default.
    assert r.returncode in (112, 113)
    assert took < 40


def test_leg_persistence_round_trip(tmp_path):
    # Completed-leg carryover across retry attempts (round-4 weakness: a
    # retried run re-paid every measured leg).  The file is keyed by the
    # shared absolute deadline; save → load restores legs, stats, headline.
    import bench

    path = str(tmp_path / "legs.json")
    stats = {"fps_720p_batch6_per_chip": 876.5, "n_devices": 1}
    headline = {"metric": "stabilized_720p_throughput", "value": 876.5,
                "vs_baseline": 1.753, "fps_1080p_per_chip": 528.8}
    bench._save_legs(path, {"batch", "out2"}, stats, headline)
    saved = bench._load_legs(path)
    assert saved["legs"] == ["batch", "out2"]
    assert saved["stats"] == stats
    assert saved["headline"]["fps_1080p_per_chip"] == 528.8


def test_leg_persistence_tolerates_torn_file(tmp_path):
    import bench

    path = str(tmp_path / "legs.json")
    with open(path, "w") as f:
        f.write('{"legs": ["batch", "ou')  # force-exit mid-write artifact
    saved = bench._load_legs(path)
    assert saved == {"legs": [], "stats": {}, "headline": {}}
    # Missing file and no-deadline (None path) are also clean starts.
    assert bench._load_legs(str(tmp_path / "nope.json"))["legs"] == []
    assert bench._load_legs(None)["legs"] == []
    bench._save_legs(None, {"x"}, {}, {})  # no-deadline: no-op, no crash


def test_persist_path_keyed_by_deadline():
    import bench

    assert bench._persist_path(float("inf")) is None
    p1 = bench._persist_path(1755740000.0)
    p2 = bench._persist_path(1755740300.0)
    assert p1 != p2 and "1755740000" in p1


def test_default_budget_fits_driver_window(monkeypatch):
    # The driver kill window is <= 600s (BENCH_r03 died at rc=124 before the
    # old 600s watchdog fired even once).  Whatever the env does, the default
    # deadline + worst-case single retry must leave margin inside 600s.
    import bench

    for var in ("STABNET_BENCH_DEADLINE_S", "STABNET_BENCH_DEADLINE_TS"):
        monkeypatch.delenv(var, raising=False)
    t0 = time.time()
    deadline = bench._deadline_ts()
    assert deadline - t0 <= 540
