"""Streaming engine end-to-end on synthetic video (tiny config)."""

import pytest
import jax
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.data.synthetic import make_video
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream import DeployOptions, StreamDriver, StreamEngine
from stabnet_tpu.stream.engine import assemble_input, init_state
from stabnet_tpu.stream.video_io import to_gray_train

CFG = get_config("tiny")


def build_engine(**kw):
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    return StreamEngine(model, variables, CFG, **kw)


def test_ring_buffer_semantics():
    # After init, every history slot holds frame 0; after k steps, offset i
    # reads the frame pushed k-i steps ago.
    import jax.numpy as jnp

    first = jnp.ones((1, CFG.height, CFG.width)) * 0.1
    state = init_state(first, CFG)
    x = assemble_input(state, jnp.zeros((1, CFG.height, CFG.width)), CFG)
    assert x.shape == (1, CFG.height, CFG.width, CFG.in_channels)
    bc = CFG.before_ch
    # mask channels all zero
    np.testing.assert_allclose(np.asarray(x[..., :bc]), 0.0)
    # history frames = 0.1
    np.testing.assert_allclose(np.asarray(x[..., bc : 2 * bc]), 0.1, atol=1e-6)
    # current channel = 0
    np.testing.assert_allclose(np.asarray(x[..., -1]), 0.0)

    # Push distinguishable frames through the ring manually.
    L = CFG.history_len
    frames = state.frames
    for t in range(1, 5):
        slot = int(state.ptr) % L
        frames = frames.at[:, slot].set(float(t) / 10)
        state = state._replace(frames=frames, ptr=state.ptr + 1)
    x = assemble_input(state, jnp.zeros((1, CFG.height, CFG.width)), CFG)
    offs = [i for i in CFG.indices if i > 0]
    for k, i in enumerate(offs):
        pushed = 4  # frames 1..4 pushed; current t=5
        expect = (5 - i) / 10 if i <= pushed else 0.1
        np.testing.assert_allclose(
            np.asarray(x[0, 0, 0, bc + k]), expect, atol=1e-6,
            err_msg=f"offset {i}",
        )


@pytest.mark.slow
def test_stream_driver_end_to_end():
    clip = make_video(8, 96, 128, seed=1, jitter=3.0)
    engine = build_engine()
    driver = StreamDriver(engine)
    res = driver.stabilize_clip(clip)
    assert res.frames.shape == (8, 96, 128, 3)
    assert res.frames.dtype == np.uint8
    t, l, b, r = res.crop_rect
    assert 0 <= t <= b < CFG.height and 0 <= l <= r < CFG.width
    assert res.cropped.shape[0] == 8
    assert np.isfinite(res.fps_net)
    # Model-scale inputs are retained only on request (O(T) host memory).
    assert res.input_gray is None
    res2 = StreamDriver(engine, DeployOptions(collect_input_gray=True)
                        ).stabilize_clip(clip)
    assert res2.input_gray.shape == (8, CFG.height, CFG.width)


@pytest.mark.slow
def test_stream_driver_refine_and_vis():
    clip = make_video(5, 64, 96, seed=2, jitter=2.0)
    engine = build_engine(refine=2)
    driver = StreamDriver(engine, DeployOptions(deploy_vis=True))
    res = driver.stabilize_clip(clip, stable=clip)
    assert res.vis is not None
    assert res.vis.shape[0] == 4  # T-1 mosaics


@pytest.mark.slow
def test_stream_driver_ablations():
    """Every ablation runs AND actually changes the history the net sees.

    The baseline is the plain on-device history; each override mode must
    produce different stabilized output (shape checks alone would pass even
    if an override were silently ignored).  `stable` is a DIFFERENT video so
    infer-with-stable genuinely changes the inputs.
    """
    clip = make_video(6, 64, 96, seed=3, jitter=2.0)
    stable = make_video(6, 64, 96, seed=9, jitter=0.0)
    engine = build_engine()
    base = StreamDriver(engine, DeployOptions()).stabilize_clip(clip, stable)
    for opt in (
        DeployOptions(infer_with_stable=True),
        DeployOptions(infer_with_last=True),
        DeployOptions(max_span=3),
        DeployOptions(infer_with_stable=True, random_black=5),
    ):
        res = StreamDriver(engine, opt).stabilize_clip(clip, stable)
        assert res.frames.shape[0] == 6
        diff = np.abs(res.frames[1:].astype(int) - base.frames[1:].astype(int))
        assert diff.max() > 0, f"{opt} did not change the output"

    # random-black occludes the stable-history path, so WITHOUT
    # infer-with-stable it must leave the on-device pipeline untouched
    # (reference: deploy_bundle.py:252-256 shifts stable_train_frame only).
    rb = StreamDriver(engine, DeployOptions(random_black=5)).stabilize_clip(
        clip, stable)
    np.testing.assert_array_equal(rb.frames, base.frames)

    # random-black must change what infer-with-stable alone feeds.
    iws = StreamDriver(engine, DeployOptions(infer_with_stable=True)
                       ).stabilize_clip(clip, stable)
    iws_rb = StreamDriver(
        engine, DeployOptions(infer_with_stable=True, random_black=5)
    ).stabilize_clip(clip, stable)
    assert np.abs(iws.frames.astype(int) - iws_rb.frames.astype(int)).max() > 0


@pytest.mark.slow
def test_multi_stream_lockstep():
    # Throughput mode: 2 concurrent streams through one engine.
    import jax.numpy as jnp

    engine = build_engine()
    clips = np.stack([make_video(4, CFG.height, CFG.width, seed=s, jitter=2.0)
                      for s in range(2)])
    grays = np.stack([
        to_gray_train(clips[s, 0], CFG.height, CFG.width) for s in range(2)
    ])
    state = engine.init(grays)
    for t in range(1, 4):
        cur_gray = np.stack([
            to_gray_train(clips[s, t], CFG.height, CFG.width) for s in range(2)
        ])
        state, out = engine.step(state, cur_gray, clips[:, t])
        assert out.warped_color.shape == (2, CFG.height, CFG.width, 3)
    assert int(state.ptr) == 4
