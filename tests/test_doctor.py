"""`stabnet-tpu doctor`: bounded rig diagnostics (stabnet_tpu/cli/doctor.py).

The one behavior that matters most is the negative one: a wedged backend
must be REPORTED within the deadline, not waited out — the failure mode is
real on tunneled TPU rigs (BASELINE.md rig notes)."""

import json

import pytest

from stabnet_tpu.cli.doctor import run_doctor


def test_host_and_mesh_checks_pass():
    report = run_doctor(timeout_s=300.0, checks=["host", "mesh"])
    assert report["checks"]["host"]["ok"]
    assert report["checks"]["host"]["cpus"] >= 1
    mesh = report["checks"]["mesh"]
    assert mesh["ok"], mesh
    assert mesh["mesh_devices"] == 8
    assert report["ok"]


@pytest.mark.slow
def test_backend_check_reports_cpu_liveness():
    # On any host the CPU/accelerator backend probe must complete and report
    # a first computation (the real liveness signal, not just enumeration).
    report = run_doctor(timeout_s=300.0, checks=["backend"])
    backend = report["checks"]["backend"]
    assert backend["ok"], backend
    assert backend["device_count"] >= 1
    assert backend["first_compute_seconds"] < 300.0


def test_wedged_backend_is_reported_not_waited_out(monkeypatch):
    monkeypatch.setenv("STABNET_DOCTOR_FAKE_HANG", "backend")
    report = run_doctor(timeout_s=3.0, checks=["backend"])
    backend = report["checks"]["backend"]
    assert backend["ok"] is False
    assert "wedged" in backend["error"]
    assert backend["seconds"] < 30.0
    assert report["ok"] is False


def test_total_budget_spans_all_probes(monkeypatch):
    # timeout_s is the TOTAL deadline: with the backend probe wedged and a
    # tiny budget, the later probes must be short-circuited ("budget
    # exhausted"), not each given their own full deadline.
    import time as _time

    monkeypatch.setenv("STABNET_DOCTOR_FAKE_HANG", "backend")
    t0 = _time.time()
    report = run_doctor(timeout_s=3.0, checks=["backend", "pallas", "mesh"])
    took = _time.time() - t0
    assert took < 30.0, took  # not 3 probes x 3s + 3 python startups
    assert report["ok"] is False
    assert "wedged" in report["checks"]["backend"]["error"]
    later = [report["checks"]["pallas"], report["checks"]["mesh"]]
    assert any("budget exhausted" in c.get("error", "") for c in later)


def test_empty_and_unknown_checks_are_errors():
    # A vacuous {"checks": {}, "ok": true} must be impossible (round-3
    # advisor finding: `checks or (...)` treated [] as "all").
    with pytest.raises(ValueError):
        run_doctor(checks=[])
    with pytest.raises(ValueError):
        run_doctor(checks=["host", "gpu"])


def test_cli_wiring(monkeypatch, capsys):
    # The subcommand parses, runs, and prints JSON; a failed check exits 1.
    from stabnet_tpu.cli.main import main

    monkeypatch.setenv("STABNET_DOCTOR_FAKE_HANG", "backend")
    with pytest.raises(SystemExit) as exc:
        main(["doctor", "--only", "backend", "--timeout", "3", "--compact"])
    assert exc.value.code == 1
    report = json.loads(capsys.readouterr().out)
    assert report["ok"] is False
