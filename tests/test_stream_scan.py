"""Whole-clip scan path vs frame-at-a-time step path: same results.

The throughput mode (stabilize_clip_device, one lax.scan XLA program) is a
pure restructuring of the per-frame recurrence, so the carried state must
match bit-exactly.  The warped uint8 frames are allowed +/-1 LSB on a tiny
fraction of pixels: the scan body and the straight-line step compile to
different XLA programs whose fusions differ by ~1 ulp in f32, which can flip
`round()` at exact-half boundaries.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.data.synthetic import make_video
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream import StreamEngine
from stabnet_tpu.stream.video_io import to_gray_train

pytestmark = pytest.mark.slow  # heavy end-to-end tier

CFG = get_config("tiny")


def test_scan_equals_stepwise():
    T = 6
    clip = make_video(T, CFG.height, CFG.width, seed=9, jitter=3.0)
    grays = np.stack(
        [to_gray_train(f, CFG.height, CFG.width) for f in clip]
    )[None]                                          # (1, T, H, W)
    colors = clip[None]                              # (1, T, H, W, 3)

    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    engine = StreamEngine(model, variables, CFG)

    # Scan path.
    warped_scan, state_scan = engine.stabilize_clip(
        jnp.asarray(grays), jnp.asarray(colors)
    )

    # Step path.
    state = engine.init(grays[:, 0])
    frames = []
    for t in range(1, T):
        state, out = engine.step(state, grays[:, t], colors[:, t])
        frames.append(np.asarray(out.warped_color))
    warped_step = np.stack(frames, axis=1)           # (1, T-1, H, W, 3)

    diff = np.abs(np.asarray(warped_scan).astype(np.int32)
                  - warped_step.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01, (diff > 0).mean()
    np.testing.assert_array_equal(
        np.asarray(state_scan.all_black), np.asarray(state.all_black)
    )
    assert int(state_scan.ptr) == int(state.ptr)


def test_sharded_batch_stabilization():
    """S=8 clips sharded over the 8-device mesh == unsharded results."""
    from stabnet_tpu.parallel import data_mesh

    S, T = 8, 4
    clips = np.stack([make_video(T, CFG.height, CFG.width, seed=s, jitter=2.0)
                      for s in range(S)])
    grays = np.stack([
        np.stack([to_gray_train(f, CFG.height, CFG.width) for f in clips[s]])
        for s in range(S)
    ])

    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    engine = StreamEngine(model, variables, CFG)

    mesh = data_mesh()
    assert mesh.devices.size == 8
    warped_sh, state_sh = engine.stabilize_clips_sharded(grays, clips, mesh=mesh)
    warped, state = engine.stabilize_clip(jnp.asarray(grays), jnp.asarray(clips))

    # Different partitionings change bf16 accumulation order inside the net;
    # theta shifts by ~1e-3 which moves the warp by a fraction of a pixel.
    # Require perceptual equality, not bit equality.
    a = np.asarray(warped_sh).astype(np.int32)
    b = np.asarray(warped).astype(np.int32)
    diff = np.abs(a - b)
    assert diff.mean() < 1.0, diff.mean()
    assert (diff <= 4).mean() > 0.95, (diff <= 4).mean()
    black_diff = np.abs(np.asarray(state_sh.all_black).astype(np.int64)
                        - np.asarray(state.all_black).astype(np.int64))
    assert black_diff.mean() < 0.1
