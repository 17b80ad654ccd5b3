"""The end-to-end quality gate: train -> stabilize -> score must PASS.

Runs scripts/quality_gate.py as a subprocess on the real accelerator: the
trained model's stabilized output must score steadier than the unstable
input AND than a random-weights baseline, with sane cropping/distortion
(the one capability the reference exists for, README.md:27-29).

TPU-gated: the 2500-step run is minutes on a v5e (plus ~20 min of CPU
scoring) but hours on this repo's 1-CPU CI hosts, so the test skips when
no accelerator is reachable.  The run-of-record numbers live in
BASELINE.md ("Quality gate" section).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _accelerator_available() -> bool:
    """Probe the DEFAULT backend in a clean subprocess (this test process's
    conftest pins JAX_PLATFORMS=cpu; the gate subprocess won't)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, timeout=700, env=env,
    )
    return r.returncode == 0 and r.stdout.strip() in ("tpu", "axon", "gpu")


@pytest.mark.slow
def test_quality_gate_passes(tmp_path):
    if not _accelerator_available():
        pytest.skip("quality gate needs an accelerator (see BASELINE.md "
                    "for the TPU run of record)")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # 2500 = the script's round-5 default: with the rigidity weights pinning
    # distortion, 1500 steps leaves the stability margin short (0.015 vs the
    # 0.02 floor); 2500 clears it with room (0.031, run of record).
    steps = os.environ.get("STABNET_QGATE_STEPS", "2500")
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "quality_gate.py"),
         "--steps", steps, "--workdir", str(tmp_path / "qgate")],
        capture_output=True, text=True, timeout=3000, env=env, cwd=_REPO,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["pass"], report["checks"]
    assert (report["mean_stability_trained"]
            > report["mean_stability_input"])
