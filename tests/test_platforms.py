"""Platform-selection helpers: placement-aware dispatch + JAX_PLATFORMS.

Regression anchor: with the shell exporting an accelerator-only
JAX_PLATFORMS (observed on this rig: `axon`), the honor helpers used to
drop the CPU backend entirely, which silently unpinned the quality-metric
chain onto the tunneled TPU backend (whose homography fits are measured
wrong there, eval/metrics.py _metric_device) — and in default
`axon,cpu` processes the CPU-pinned chain CRASHED, because the flow
sampler dispatched on `jax.default_backend()` (which ignores a
`jax.default_device` pin) and lowered a Pallas TPU kernel for the CPU
device ("Only interpret mode is supported on CPU backend").
"""

import jax
import numpy as np
import pytest

from stabnet_tpu.utils.platforms import (
    _normalized_platforms,
    placement_platform,
)


def test_normalized_platforms_appends_cpu():
    assert _normalized_platforms("axon", True) == "axon,cpu"
    assert _normalized_platforms("tpu", True) == "tpu,cpu"


def test_normalized_platforms_preserves_existing_cpu():
    assert _normalized_platforms("cpu", True) == "cpu"
    assert _normalized_platforms("axon,cpu", True) == "axon,cpu"
    assert _normalized_platforms("axon, cpu", True) == "axon, cpu"


def test_normalized_platforms_keep_cpu_false():
    assert _normalized_platforms("axon", False) == "axon"


def test_placement_platform_follows_default_device_pin():
    # On the CPU test platform both read "cpu", but the pin must be what is
    # consulted: a Device-object pin and the unpinned default both resolve.
    assert placement_platform() == jax.default_backend()
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        assert placement_platform() == "cpu"


def test_flow_runs_under_cpu_pin():
    """The metric chain's exact usage: tvl1_flow traced inside a jit that
    was entered under a default_device(cpu) pin must pick the XLA sampler
    (the Pallas TPU kernel cannot lower for the CPU device)."""
    from stabnet_tpu.ops.flow import tvl1_flow

    rng = np.random.RandomState(0)
    a = rng.rand(2, 32, 48).astype(np.float32)
    b = np.roll(a, 2, axis=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        u = np.asarray(tvl1_flow(a, b, fine_iters=10))
    assert u.shape == (2, 32, 48, 2)
    # roll(+2, x): b[y, x] = a[y, x-2], so a[y, x] ~= b[y, x+2] => u_x ~= +2.
    interior = u[:, 8:-8, 8:-8, 0]
    assert abs(interior.mean() - 2.0) < 0.75, interior.mean()


def test_score_stabilized_clip_smoke():
    """End-to-end scoring in this process (CPU backend): the gate's shared
    record must compute without error and contain every field."""
    from stabnet_tpu.eval import score_stabilized_clip

    rng = np.random.RandomState(0)
    T, H, W = 8, 48, 64
    frames = (rng.rand(T, H, W, 3) * 255).astype(np.uint8)
    gray = (rng.rand(T, H, W) * 0.8 - 0.4).astype(np.float32)
    rec = score_stabilized_clip(frames, gray, (H, W),
                                crop_rect=(2, 2, H - 3, W - 3))
    for key in ("stability", "cropping", "distortion", "stability_input",
                "crop_area"):
        assert key in rec and np.isfinite(rec[key]), rec
