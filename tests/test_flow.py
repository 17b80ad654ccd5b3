"""TV-L1 optical flow: estimator accuracy + pipeline wiring.

The estimator replaces the DeepStab dataset's precomputed TV-L1 flow
(reference get_data_mini_after.py:210), so the tests check the two things the
temporal loss needs from it: (a) it recovers known motion, (b) its output is
in the record/sampling convention (data/synthetic.py's flow formula).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stabnet_tpu.config import TINY
from stabnet_tpu.ops.flow import flow_to_sampling, tvl1_flow
from stabnet_tpu.ops.warp import bilinear_sample


def _smooth_image(rng, h, w, passes=5):
    img = rng.rand(h, w).astype(np.float32)
    for _ in range(passes):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    return (img - img.min()) / (img.max() - img.min())


def _translate(img, dx, dy):
    """i1 with i0(p) = i1(p + (dx, dy)) on the interior (bilinear)."""
    from scipy.ndimage import map_coordinates

    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w]
    return map_coordinates(img, [ys - dy, xs - dx], order=1,
                           mode="nearest").astype(np.float32)


def test_recovers_translation():
    rng = np.random.RandomState(3)
    H, W = 96, 128
    dx, dy = 3.6, -2.3
    i0 = _smooth_image(rng, H, W)
    i1 = _translate(i0, dx, dy)
    u = np.asarray(tvl1_flow(jnp.asarray(i0)[None], jnp.asarray(i1)[None]))[0]
    inner = u[16:-16, 16:-16]
    assert abs(inner[..., 0].mean() - dx) < 0.2
    assert abs(inner[..., 1].mean() - dy) < 0.2
    assert np.percentile(np.abs(inner[..., 0] - dx), 90) < 0.5


def test_zero_motion_gives_zero_flow():
    rng = np.random.RandomState(0)
    i0 = _smooth_image(rng, 64, 64)
    u = np.asarray(tvl1_flow(jnp.asarray(i0)[None], jnp.asarray(i0)[None],
                             num_warps=2, num_iters=30))[0]
    assert np.abs(u).max() < 0.05


def test_warp_error_reduction_and_convention():
    """Sampling i1 at flow_to_sampling(u) must reconstruct i0 — this is
    exactly how train_step consumes the flow (train/train.py temporal loss),
    so it checks both accuracy and the NDC convention in one go."""
    rng = np.random.RandomState(7)
    H, W = 96, 128
    i0 = _smooth_image(rng, H, W)
    i1 = _translate(i0, -2.2, 1.4)
    u = tvl1_flow(jnp.asarray(i0)[None], jnp.asarray(i1)[None])
    samp = flow_to_sampling(u)
    i1w = np.asarray(bilinear_sample(jnp.asarray(i1)[None, ..., None],
                                     samp[..., 0], samp[..., 1]))[0, ..., 0]
    c = np.s_[16:-16, 16:-16]
    before = np.abs(i1 - i0)[c].mean()
    after = np.abs(i1w - i0)[c].mean()
    assert after < 0.3 * before


def test_flow_to_sampling_matches_record_convention():
    """For a constant displacement, flow_to_sampling reproduces the synthetic
    dataset's flow formula (data/synthetic.py: 2*(p + d)/size - 1)."""
    H, W = 24, 32
    d = np.array([1.5, -0.75], np.float32)
    u = np.broadcast_to(d, (1, H, W, 2))
    got = np.asarray(flow_to_sampling(jnp.asarray(u)))[0]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    want = np.stack([2.0 * (xs + d[0]) / W - 1.0,
                     2.0 * (ys + d[1]) / H - 1.0], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_pipeline_computes_flow_for_flowless_shards(tmp_path):
    """Shards written WITHOUT a flow field train via --compute-flow: the
    computed flow must agree with the (exact) synthetic ground truth."""
    from stabnet_tpu.data.pipeline import InputPipeline
    from stabnet_tpu.data.records import write_shards
    from stabnet_tpu.data.synthetic import make_raw_example

    cfg = TINY
    examples = [make_raw_example(cfg, seed=i) for i in range(4)]
    with_flow = str(tmp_path / "with")
    without = str(tmp_path / "without")
    write_shards(with_flow, examples, shard_size=4)
    flowless = [{k: v for k, v in e.items() if k != "flow"} for e in examples]
    write_shards(without, flowless, shard_size=4)

    with pytest.raises(ValueError, match="compute-flow"):
        next(iter(InputPipeline(without, cfg, batch_size=2, shuffle=False)))

    # Same seed => identical augmentation draws, so the two flows describe
    # the SAME augmented stable pair: the on-device TV-L1 estimate must agree
    # with the (exact, warped-alongside) record flow on the interior.
    ref = next(iter(InputPipeline(with_flow, cfg, batch_size=2, shuffle=False,
                                  seed=5)))
    got = next(iter(InputPipeline(without, cfg, batch_size=2, shuffle=False,
                                  seed=5, compute_flow=True)))
    f_ref = np.asarray(ref["flow"])
    f_got = np.asarray(got["flow"])
    assert f_got.shape == (2, cfg.height, cfg.width, 2)
    assert np.isfinite(f_got).all()
    np.testing.assert_allclose(np.asarray(ref["y1"]), np.asarray(got["y1"]))

    scale = np.array([cfg.width, cfg.height], np.float32) / 2.0
    diff_px = np.abs(f_got - f_ref) * scale
    assert np.median(diff_px[:, 8:-8, 8:-8]) < 1.0

    # compute_flow on shards that DO carry flow: the record flow is dropped
    # before augmentation (never uploaded/warped) and replaced by the same
    # TV-L1 estimate — regression test for the flow-skip path.
    both = next(iter(InputPipeline(with_flow, cfg, batch_size=2, shuffle=False,
                                   seed=5, compute_flow=True)))
    np.testing.assert_allclose(np.asarray(both["flow"]), f_got)


@pytest.mark.slow
def test_pipeline_skips_flow_until_gate_step(tmp_path):
    """flow_from_step: batches before the temporal gate carry the zero-motion
    map (no TV-L1 solve); from the gate step on, the real estimate."""
    from stabnet_tpu.data.pipeline import InputPipeline
    from stabnet_tpu.data.records import write_shards
    from stabnet_tpu.data.synthetic import make_raw_example

    cfg = TINY
    examples = [make_raw_example(cfg, seed=i) for i in range(4)]
    d = str(tmp_path / "shards")
    write_shards(d, examples, shard_size=4)

    gated = iter(InputPipeline(d, cfg, batch_size=2, shuffle=False, seed=5,
                               compute_flow=True, flow_from_step=1))
    b0, b1 = next(gated), next(gated)
    # Batch 0 (consumed at step 0 < 1): identity sampling map == the map the
    # zero displacement field produces.
    ident = np.asarray(flow_to_sampling(jnp.zeros((2, cfg.height, cfg.width, 2))))
    np.testing.assert_allclose(np.asarray(b0["flow"]), ident, atol=1e-6)
    # Batch 1 (step 1 >= 1): the real TV-L1 flow, same as an ungated pipeline's
    # second batch (same seed => same augmentation stream).
    ref = iter(InputPipeline(d, cfg, batch_size=2, shuffle=False, seed=5,
                             compute_flow=True))
    next(ref)
    np.testing.assert_allclose(np.asarray(b1["flow"]),
                               np.asarray(next(ref)["flow"]), atol=1e-6)
