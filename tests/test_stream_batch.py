"""Batch serving: many clips, one on-device scan (StreamDriver.stabilize_batch).

Covers the unequal-length validity mask (per-stream state freeze), the
chunked fixed-executable segmentation, and the driver/CLI contract.  The
reference serves one clip at a time (deploy_bundle.py:183); batching over
lock-step streams is a TPU-native capability of this framework.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stabnet_tpu.config import get_config
from stabnet_tpu.data.synthetic import make_video
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream import DeployOptions, StreamDriver, StreamEngine
from stabnet_tpu.stream.video_io import to_gray_train

pytestmark = pytest.mark.slow  # heavy end-to-end tier

CFG = get_config("tiny")


@pytest.fixture(scope="module")
def engine():
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    return StreamEngine(model, variables, CFG)


def _clip(T, seed, jitter=3.0):
    return np.stack(make_video(T, CFG.height, CFG.width, seed=seed,
                               jitter=jitter))


def _grays(clip):
    return np.stack([to_gray_train(f, CFG.height, CFG.width) for f in clip])


def test_valid_mask_freezes_state(engine):
    """An invalid step leaves the stream's ring buffers and crop accumulator
    untouched; other streams and the lock-step pointer advance normally.
    Both runs use the SAME compiled executable, so lanes compare exactly."""
    A, B = _clip(3, seed=1), _clip(3, seed=2)
    grays = np.stack([_grays(A), _grays(B)])          # (2, 3, H, W)
    colors = np.stack([A, B])                         # (2, 3, H, W, 3)

    v_full = np.ones((2, 2), bool)
    v_cut = np.array([[True, True], [True, False]])   # B ends one step early

    w_full, s_full = engine.stabilize_clip(grays, colors, valid=v_full)
    w_cut, s_cut = engine.stabilize_clip(grays, colors, valid=v_cut)

    # Stream A is unaffected by B's validity.
    np.testing.assert_array_equal(np.asarray(w_full[0]), np.asarray(w_cut[0]))
    np.testing.assert_array_equal(np.asarray(s_full.frames[0]),
                                  np.asarray(s_cut.frames[0]))
    # B's shared valid prefix matches.
    np.testing.assert_array_equal(np.asarray(w_full[1, 0]),
                                  np.asarray(w_cut[1, 0]))
    # B's ring slot for the masked step still holds the warm-up frame
    # (init_state replicates frame 0 into every slot).
    L = CFG.history_len
    slot = int(s_cut.ptr - 1) % L  # slot the masked step would have written
    np.testing.assert_allclose(np.asarray(s_cut.frames[1, slot]), grays[1, 0],
                               atol=1e-6)
    assert not np.array_equal(np.asarray(s_full.frames[1, slot]), grays[1, 0])
    # Lock-step pointer advanced identically.
    assert int(s_full.ptr) == int(s_cut.ptr)
    # B's crop accumulator froze at its true end: equal to a fresh run of the
    # first step only (int counts are robust across executables).
    w1, s1 = engine.stabilize_clip(grays[:, :2], colors[:, :2],
                                   valid=np.ones((2, 1), bool))
    np.testing.assert_array_equal(np.asarray(s_cut.all_black[1]),
                                  np.asarray(s1.all_black[1]))


def test_batch_unequal_lengths_driver(engine):
    """Driver-level: two clips of different lengths come back with their true
    lengths, finite throughput, and per-clip crops."""
    A, B = _clip(6, seed=3), _clip(4, seed=4)
    driver = StreamDriver(engine, DeployOptions())
    res = driver.stabilize_batch([A, B])
    assert [len(r.frames) for r in res] == [6, 4]
    for r in res:
        assert r.frames.dtype == np.uint8
        assert r.frames.shape[1:] == A.shape[1:]
        assert np.isfinite(r.fps_net)
        top, left, bot, right = r.crop_rect
        assert 0 <= top <= bot < CFG.height
        assert 0 <= left <= right < CFG.width
        assert r.cropped.shape[0] == r.frames.shape[0]


def test_batch_chunked_matches_unchunked(engine):
    """chunk=2 re-runs one fixed-size executable over segments; results match
    the single-scan path (uint8 within 1 LSB across the two compilations,
    integer crop accumulators exactly)."""
    A, B = _clip(6, seed=5), _clip(5, seed=6)
    driver = StreamDriver(engine, DeployOptions())
    res1 = driver.stabilize_batch([A, B])
    res2 = driver.stabilize_batch([A, B], chunk=2)
    for r1, r2 in zip(res1, res2):
        assert r1.crop_rect == r2.crop_rect
        np.testing.assert_array_equal(r1.all_black, r2.all_black)
        diff = np.abs(r1.frames.astype(np.int32) - r2.frames.astype(np.int32))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.01


def test_batch_rejects_ablations(engine):
    driver = StreamDriver(engine, DeployOptions(infer_with_last=True))
    with pytest.raises(ValueError, match="production"):
        driver.stabilize_batch([_clip(3, seed=7)])
    driver = StreamDriver(engine, DeployOptions())
    with pytest.raises(ValueError, match="chunk"):
        driver.stabilize_batch([_clip(3, seed=8)], chunk=2, sharded=True)
