"""Rig diagnostics: bounded backend-liveness and capability probes.

Production serving needs a way to tell "the accelerator is wedged" from "the
job is slow" without hanging the caller: on tunneled/virtualized TPU rigs a
dead client can leave the chip claimed, after which every new client blocks
INSIDE backend initialization indefinitely (the failure mode documented in
BASELINE.md; the reference has nothing comparable — its failure story is a
CUDA error string, deploy_bundle.py:37).

Every device-touching probe here runs in a SUBPROCESS with a hard deadline,
so `stabnet-tpu doctor` always returns, and returns structured JSON:

    {"ok": true/false, "checks": {name: {"ok": ..., "seconds": ...}, ...}}

Checks:
  host       — CPU count, host RAM, mem pressure (no subprocess needed).
  backend    — import jax, enumerate devices, run one tiny computation and
               read it back.  The readback is the real liveness test: a
               wedged tunnel often still enumerates devices (observed on
               this rig) but blocks on the first RPC that touches the chip.
  pallas     — compile + run the Pallas warp sampler on tiny shapes (TPU
               backends only; on CPU hosts reports "skipped" since serving
               there rides the XLA fallback).
  mesh       — build the virtual 8-device CPU mesh and shard one array over
               it (validates the multi-chip code path host-side).

Exit status: 0 when every non-skipped check passes, 1 otherwise.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

# Each probe is a self-contained script run as `python -c`: a wedged backend
# blocks the CHILD, the parent's deadline still fires, and killing the child
# never takes the caller down with it.
_BACKEND_PROBE = """
import json, time
t0 = time.time()
import jax, jax.numpy as jnp
devs = jax.devices()
t_enum = time.time() - t0
x = float(jnp.arange(128.0).sum())           # first computation + readback
assert x == 8128.0, x
report = {
    "platform": jax.default_backend(),
    "devices": [str(d) for d in devs],
    "device_count": len(devs),
    "enumerate_seconds": round(t_enum, 3),
    "first_compute_seconds": round(time.time() - t0, 3),
}
try:                                          # capacity signal for serving
    stats = devs[0].memory_stats() or {}
    if "bytes_limit" in stats:
        report["hbm_gb"] = round(stats["bytes_limit"] / 2**30, 1)
        report["hbm_in_use_gb"] = round(
            stats.get("bytes_in_use", 0) / 2**30, 2)
except Exception:
    pass                                      # not all backends expose stats
print(json.dumps(report))
"""

_PALLAS_PROBE = """
import json, time
import jax, jax.numpy as jnp
import numpy as np
if jax.default_backend() not in ("tpu", "axon"):
    print(json.dumps({"skipped": "no TPU backend (serving uses XLA fallback)"}))
else:
    from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas
    t0 = time.time()
    im = jnp.asarray(np.random.RandomState(0).rand(1, 32, 128, 1), jnp.float32)
    xm = jnp.zeros((1, 32, 128), jnp.float32)
    ym = jnp.zeros((1, 32, 128), jnp.float32)
    out = np.asarray(bilinear_sample_pallas(im, xm, ym, exact=True))
    assert out.shape == im.shape, out.shape
    print(json.dumps({"compile_run_seconds": round(time.time() - t0, 3)}))
"""

_MESH_PROBE = """
import json, os, re, time
# Replace (not append next to) any inherited device-count flag: duplicate
# conflicting flags make the winner an XLA implementation detail.
flags = re.sub(r"--xla_force_host_platform_device_count=\\S+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stabnet_tpu.parallel import data_mesh
t0 = time.time()
mesh = data_mesh()
x = jax.device_put(jnp.arange(float(8 * 4)).reshape(8, 4),
                   NamedSharding(mesh, P("data")))
assert float(jax.jit(lambda a: a.sum())(x)) == sum(range(32))
print(json.dumps({"mesh_devices": int(mesh.devices.size),
                  "seconds": round(time.time() - t0, 3)}))
"""


def _run_probe(code: str, timeout_s: float, env_overrides=None) -> dict:
    """Run probe code in a subprocess; never block past the deadline.

    The deadline must hold even against the exact failure doctor exists to
    diagnose: a child wedged in uninterruptible kernel sleep mid-RPC can
    ignore SIGKILL, so after killing the child's process group the parent
    waits only a few seconds and then ORPHANS the child and returns the
    wedged-backend report anyway (round-3 advisor finding — subprocess.run's
    TimeoutExpired path calls wait() with no bound).
    """
    if timeout_s < 1.0:
        return {"ok": False, "seconds": 0.0,
                "error": "total doctor budget exhausted before this probe "
                         "ran (an earlier probe consumed the deadline)"}
    env = dict(os.environ)
    # Probes must see the repo package even when doctor runs from elsewhere.
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_overrides or {})
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, env=env,
        start_new_session=True,    # own process group: killpg can't hit us
    )
    try:
        stdout, stderr = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        try:
            proc.wait(timeout=5.0)
        except subprocess.TimeoutExpired:
            pass  # SIGKILL-immune (kernel D-state): orphan it, report anyway
        return {
            "ok": False,
            "seconds": round(time.time() - t0, 1),
            "error": f"probe did not respond within {timeout_s:.0f}s — "
                     "backend wedged or severely overloaded",
        }
    out = stdout.strip().splitlines()
    if proc.returncode != 0 or not out:
        return {
            "ok": False,
            "seconds": round(time.time() - t0, 1),
            "error": (stderr or "no output").strip()[-500:],
        }
    try:
        detail = json.loads(out[-1])
    except ValueError:
        return {"ok": False, "seconds": round(time.time() - t0, 1),
                "error": f"unparseable probe output: {out[-1][:200]}"}
    if "skipped" in detail:
        return {"ok": True, "skipped": detail["skipped"],
                "seconds": round(time.time() - t0, 1)}
    detail["ok"] = True
    detail["seconds"] = round(time.time() - t0, 1)
    return detail


def _host_check() -> dict:
    info = {"ok": True, "cpus": os.cpu_count()}
    try:
        with open("/proc/meminfo") as f:
            mem = {l.split(":")[0]: l.split()[1] for l in f if ":" in l}
        info["ram_gb"] = round(int(mem["MemTotal"]) / 1e6, 1)
        info["ram_available_gb"] = round(int(mem["MemAvailable"]) / 1e6, 1)
    except (OSError, KeyError, ValueError):
        pass  # non-Linux host: CPU count alone
    return info


_ALL_CHECKS = ("host", "backend", "pallas", "mesh")


def run_doctor(timeout_s: float = 120.0, checks=None) -> dict:
    """Run the probes; return the report dict (see module docstring).

    `timeout_s` is the TOTAL budget: each device-touching probe gets what is
    left of it, so even with every probe wedged the call returns within
    ~timeout_s (+ a few seconds of kill grace), not checks*timeout_s.
    `checks=None` means all; an explicit empty list and unknown names are
    errors (a vacuous {"checks": {}, "ok": true} must be impossible).
    """
    if checks is None:
        checks = _ALL_CHECKS
    unknown = set(checks) - set(_ALL_CHECKS)
    if unknown:
        raise ValueError(f"unknown doctor checks: {sorted(unknown)}; "
                         f"valid: {list(_ALL_CHECKS)}")
    if not checks:
        raise ValueError("empty check list — pass None for all checks")
    hang = os.environ.get("STABNET_DOCTOR_FAKE_HANG")  # test hook
    wanted = set(checks)
    deadline = time.time() + timeout_s
    remaining = lambda: deadline - time.time()  # noqa: E731
    report: dict = {"checks": {}}
    if "host" in wanted:
        report["checks"]["host"] = _host_check()
    if "backend" in wanted:
        code = ("import time; time.sleep(3600)" if hang == "backend"
                else _BACKEND_PROBE)
        report["checks"]["backend"] = _run_probe(code, remaining())
    if "pallas" in wanted:
        report["checks"]["pallas"] = _run_probe(_PALLAS_PROBE, remaining())
    if "mesh" in wanted:
        # Independent of the accelerator: force the CPU platform.
        report["checks"]["mesh"] = _run_probe(
            _MESH_PROBE, remaining(), env_overrides={"JAX_PLATFORMS": "cpu"})
    report["ok"] = all(c.get("ok") for c in report["checks"].values())
    return report


def cmd_doctor(args) -> None:
    report = run_doctor(timeout_s=args.timeout,
                        checks=args.only if args.only else None)
    print(json.dumps(report, indent=None if args.compact else 2))
    if not report["ok"]:
        sys.exit(1)


def add_parser(sub) -> None:
    p = sub.add_parser(
        "doctor",
        help="bounded rig diagnostics: backend liveness, Pallas path, "
             "virtual mesh (never hangs on a wedged accelerator)")
    p.add_argument("--timeout", type=float, default=120.0,
                   help="TOTAL deadline in seconds across all probes "
                        "(default 120; a wedged tunnel is reported within "
                        "this bound, not waited out)")
    p.add_argument("--only", nargs="+", default=None,
                   choices=list(_ALL_CHECKS),
                   help="run a subset of checks")
    p.add_argument("--compact", action="store_true",
                   help="single-line JSON")
    p.set_defaults(fn=cmd_doctor)
