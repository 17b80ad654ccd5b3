"""Test configuration: run every test on a virtual 8-device CPU platform.

Multi-chip sharding code paths are exercised without TPU hardware via XLA's
host-platform device-count override (SURVEY.md section 4/7).

Note: this environment may carry a TPU PJRT plugin ("axon") that force-installs
`jax_platforms="axon,cpu"`, overriding the JAX_PLATFORMS env var — so the env
var alone is NOT enough; the config must be updated after jax import (before
any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()
