"""Quality metrics: homography fit + the three stabilization scores.

The scores follow Bundled Camera Paths (Liu et al. 2013), the metrics the
StabNet paper reports; the reference repo itself has no metric code, so the
oracle here is construction: clips with KNOWN motion/zoom must score
accordingly.
"""

import numpy as np
import jax.numpy as jnp

from stabnet_tpu.eval.metrics import (
    _crossvideo_h,
    _interframe_h,
    cropping_score,
    distortion_score,
    evaluate_clip,
    fit_homographies,
    stability_score,
)


def _smooth(rng, h, w, passes=5):
    img = rng.rand(h, w).astype(np.float32)
    for _ in range(passes):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    return (img - img.min()) / (img.max() - img.min())


def _clip_with_offsets(offsets, h=96, w=128, seed=0):
    """Frames = one big texture viewed through a window at given offsets."""
    rng = np.random.RandomState(seed)
    big = _smooth(rng, h + 64, w + 64)
    return np.stack([big[32 + dy:32 + dy + h, 32 + dx:32 + dx + w]
                     for dx, dy in offsets])


def test_fit_homographies_exact():
    rng = np.random.RandomState(1)
    src = rng.rand(40, 2).astype(np.float32) * 100
    Hm = np.array([[1.02, 0.01, 3.0], [-0.02, 0.98, -2.0], [1e-4, -1e-4, 1.0]],
                  np.float32)
    pts = np.concatenate([src, np.ones((40, 1), np.float32)], axis=-1) @ Hm.T
    dst = (pts[:, :2] / pts[:, 2:])[None]
    got = np.asarray(fit_homographies(jnp.asarray(src), jnp.asarray(dst)))[0]
    np.testing.assert_allclose(got / got[2, 2], Hm, atol=1e-3)


def test_stability_orders_smooth_above_shaky():
    T = 48
    t = np.arange(T)
    smooth_path = np.stack([(2 * np.sin(2 * np.pi * t / T)).astype(int),
                            np.zeros(T, int)], axis=-1)
    rng = np.random.RandomState(3)
    shaky_path = smooth_path + rng.randint(-6, 7, size=(T, 2))
    clip_smooth = _clip_with_offsets(smooth_path)
    clip_shaky = _clip_with_offsets(shaky_path)
    s_smooth = float(stability_score(_interframe_h(jnp.asarray(clip_smooth))))
    s_shaky = float(stability_score(_interframe_h(jnp.asarray(clip_shaky))))
    assert s_smooth > s_shaky + 0.15
    assert s_smooth > 0.8


def test_cropping_and_distortion_identity():
    clip = _clip_with_offsets([(0, 0)] * 6)
    Hs = _crossvideo_h(jnp.asarray(clip), jnp.asarray(clip))
    assert float(cropping_score(Hs)) > 0.99
    assert float(distortion_score(Hs)) > 0.99


def test_cropping_detects_zoom():
    """A stabilizer that zooms 10% in must score cropping ~= 1/1.1.

    The output window is centered on the input view so the residual
    displacement stays within the flow pyramid's tracking range; the
    texture keeps some high-frequency content (a spatially varying field
    needs local gradients everywhere)."""
    rng = np.random.RandomState(5)
    big = _smooth(rng, 192, 256, passes=3)
    T, h, w = 6, 96, 128
    inp = np.stack([big[32:32 + h, 48:48 + w]] * T)
    from scipy.ndimage import zoom as ndzoom

    zoomed = ndzoom(big, 1.1, order=1)
    # window start chosen so the zoom fixed point sits mid-frame
    out = np.stack([zoomed[40:40 + h, 59:59 + w]] * T)
    Hs = _crossvideo_h(jnp.asarray(inp), jnp.asarray(out))
    crop = float(cropping_score(Hs))
    assert abs(crop - 1.0 / 1.1) < 0.04
    # isotropic zoom distorts nothing
    assert float(distortion_score(Hs)) > 0.95


def test_evaluate_clip_end_to_end():
    clip = _clip_with_offsets([(i % 2, 0) for i in range(12)])
    scores = evaluate_clip(jnp.asarray(clip), jnp.asarray(clip))
    assert set(scores) == {"stability", "cropping", "distortion"}
    for v in scores.values():
        assert 0.0 < v <= 1.0 + 1e-6
