"""The bench init watchdog: fires on a wedged backend, is silent otherwise."""

import os
import subprocess
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(body: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", f"import sys; sys.path.insert(0, {_REPO!r})\n" + body],
        capture_output=True, text=True, timeout=60,
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
    assert r.returncode == 3
    assert "wedged" in r.stderr
    assert "unreachable" not in r.stdout


def test_retry_wrapper_relaunches_on_watchdog_abort():
    # A watchdog short enough that backend init can't beat it makes every
    # child attempt exit 3; the parent must retry (announcing it) and only
    # then give up with rc=3.  Success/crash exits pass through untested
    # here — they take the sys.exit(rc) fast path.
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        STABNET_BENCH_WATCHDOG_S="0.05",
        STABNET_BENCH_ATTEMPTS="2",
        STABNET_BENCH_RETRY_PAUSE_S="0",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 3
    assert "retrying" in r.stderr
    assert r.stderr.count("wedged") == 2  # both attempts fired the watchdog


def test_silent_when_disarmed():
    r = _run(
        "import bench, time\n"
        "bench._arm_init_watchdog(1.0).set()\n"
        "time.sleep(2)\n"
        "print('survived')\n"
    )
    assert r.returncode == 0
    assert "survived" in r.stdout
