"""Test configuration: run every test on a virtual 8-device CPU platform.

Multi-chip sharding code paths are exercised without TPU hardware via
XLA's host-platform device-count override, per the project build plan
(SURVEY.md section 4/7).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the harness may export a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU test numerics deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")
