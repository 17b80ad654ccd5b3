"""Stabilization quality metrics: stability / cropping / distortion.

The StabNet paper (TIP 2018) evaluates with the cropping-ratio, distortion,
and stability scores introduced by Liu et al., "Bundled Camera Paths for
Video Stabilization" (SIGGRAPH 2013); the reference REPO ships no metric
code at all (its only quality signal is eyeballing the output videos,
/root/reference/README.md).  This module makes those scores a first-class,
on-device capability so runs are comparable without manual inspection:

  * inter-frame / cross-video motion is measured with the framework's own
    TV-L1 flow (ops/flow.py) sampled on a coarse grid and least-squares
    fitted to a homography — no feature detector dependency,
  * the anisotropy distortion score and the homography-scale cropping
    score follow the standard definitions; the stability score is a
    DELIBERATE VARIANT of the Bundled-Camera-Paths spectral score — a
    velocity-spectrum ratio with a measurement-noise floor, NOT comparable
    to published BCP/StabNet absolute numbers (see `stability_score` for
    the measured reasons the cumulative-path convention was rejected),
  * everything is jit-friendly: fixed grids, batched solves, `jnp.fft`.

For clips stabilized by THIS framework the exact black-border crop is also
available directly (`ops.max_clear_rect` over the accumulated masks) — the
flow-based scores exist so arbitrary video pairs (e.g. the reference
implementation's outputs) can be measured too.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.ops.flow import tvl1_flow


def _metric_device():
    """The device the metric chain is pinned to: the host CPU backend.

    Scores are an offline audit, so they must be platform-deterministic —
    and measured on this rig, the batched prealigned fit produced wrong
    homographies on the tunneled TPU backend (tx doubled, phantom ty
    components) while matching the analytic path anchors exactly on CPU.
    Pinning costs ~11 s per 120-frame clip at model scale (warm), which the
    quality gate absorbs; serving itself is unaffected.  Returns None when
    no CPU backend exists (then the default device is used) — with a LOUD
    warning, because scores measured on the tunneled TPU backend are known
    wrong on this rig; `utils.honor_jax_platforms_env(keep_cpu=True)` keeps
    the CPU backend registered even under an accelerator-only JAX_PLATFORMS.
    """
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        import os

        from stabnet_tpu.utils import get_logger

        get_logger().warning(
            "no CPU backend available (JAX_PLATFORMS=%s): quality scores "
            "will run on the default %s backend, which is NOT "
            "platform-deterministic on this rig (eval/metrics.py "
            "_metric_device)", os.environ.get("JAX_PLATFORMS"),
            jax.default_backend())
        return None


def _on_metric_device():
    dev = _metric_device()
    return jax.default_device(dev) if dev is not None \
        else contextlib.nullcontext()


def _grid_correspondences(u: jax.Array, step: int = 16,
                          margin: int = 16) -> Tuple[jax.Array, jax.Array]:
    """Sample flow on a coarse interior grid -> point correspondences.

    Args:
      u: (T, H, W, 2) pixel-displacement flow fields.
      step/margin: grid pitch and border exclusion (borders carry warp
        fade-out and flow boundary effects).

    Returns:
      (src (N, 2), dst (T, N, 2)) pixel coordinates.
    """
    T, H, W = u.shape[:3]
    # Adapt to small frames: an 8-DOF homography fit needs a well-spread
    # grid, so never let the margin/pitch collapse the grid below ~5x5.
    step = max(4, min(step, min(H, W) // 6))
    margin = max(4, min(margin, min(H, W) // 6))
    ys = jnp.arange(margin, H - margin, step)
    xs = jnp.arange(margin, W - margin, step)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    src = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(jnp.float32)
    flow_at = u[:, gy.reshape(-1), gx.reshape(-1)]          # (T, N, 2)
    dst = src[None] + flow_at
    return src, dst


def _rect_fill(frames: np.ndarray, rect) -> np.ndarray:
    """Replace everything outside the delivered rect of (T, H, W) frames
    with the nearest inside-rect pixel (edge replication).

    The stability score is defined on the video a stabilizer DELIVERS; the
    frames carry a black canvas outside the delivered crop.  Measured on
    this rig's 16-clip gate, that STATIC border corrupts the motion
    measurement however the fit points are masked: it anchors the
    phase-correlation pre-alignment to zero shift (so TV-L1 saturates on
    the real shake and the path comes out falsely smooth — a random-warp
    control inflated from 0.59 input to 0.84), and TV-L1's regularization
    bleeds the border's zero flow into the content.  Cropping instead of
    filling is also wrong: small frames bias the score upward (the SAME
    input clip measured 0.59 full-frame but 0.72 as a 32x48 crop — less
    content makes both estimators less able to see the shake).  Edge
    replication keeps full-frame shapes (one compiled TV-L1 program) while
    making every pixel move WITH the delivered content, so neither
    estimator has a static structure to latch onto; the homography fit is
    additionally restricted to points inside the rect.
    """
    top, left, bot, right = [int(v) for v in rect]
    iy = np.clip(np.arange(frames.shape[1]), top, bot)
    ix = np.clip(np.arange(frames.shape[2]), left, right)
    return np.ascontiguousarray(frames[:, iy][:, :, ix])


def fit_homographies(src: jax.Array, dst: jax.Array,
                     weights: jax.Array = None) -> jax.Array:
    """Least-squares homography fit per frame (DLT).

    The returned H is SCALE-UNNORMALIZED: the DLT pins h22 = 1 in the
    normalized frame, but the Hartley denormalization (T_dst_inv @ Hn @
    T_src) generally leaves H[..., 2, 2] != 1.  All projective uses are
    scale-invariant; callers needing h22 = 1 (e.g. for reading off
    translations) divide via `_normalize_h`.

    The solve is HARTLEY-NORMALIZED (both point sets shifted to zero mean
    and scaled to sqrt(2) RMS radius before building the system, the
    recovered H conjugated back).  This is not optional hygiene: on raw
    pixel coordinates the 8x8 normal equations carry a condition number
    ~O(W^4), and in float32 the solve returns garbage — measured on a
    smooth-pan clip whose dense TV-L1 flow was correct to 0.01 px, the
    unnormalized fit's per-frame translations had 2.2 px error std (the
    flow said -1.31, the fit said -3.5 or +0.9), while the normalized fit
    recovers the flow's translation exactly.  (This was also the origin of
    the 'wrong homographies on the tunneled TPU backend' rig note: an
    ill-conditioned f32 solve differs arbitrarily across backends.)

    Args:
      src: (N, 2) source points; dst: (T, N, 2) matched points.
      weights: optional (T, N) per-point weights (e.g. a 0/1 inclusion mask
        restricting the fit to the delivered crop region).  If the active
        count drops below 10 points the fit falls back to all points — a
        sliver of a crop must degrade gracefully, not produce a degenerate
        8-DOF solve (10 = 20 equations for 8 unknowns, with the small-frame
        grids in mind: a 48x64 clip has only ~24 grid points total).

    Returns:
      (T, 3, 3) homographies mapping src -> dst.
    """
    T, N = dst.shape[:2]
    if weights is None:
        weights = jnp.ones((T, N), src.dtype)

    cs = jnp.mean(src, axis=0)
    ss = jnp.sqrt(2.0) / jnp.maximum(
        jnp.sqrt(jnp.mean(jnp.sum((src - cs) ** 2, axis=-1))), 1e-6)
    sn = (src - cs) * ss
    x, y = sn[:, 0], sn[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    T_src = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T_src = T_src.at[0, 0].set(ss).at[1, 1].set(ss)
    T_src = T_src.at[0, 2].set(-ss * cs[0]).at[1, 2].set(-ss * cs[1])

    def solve(d, wi):
        wi = jnp.where(jnp.sum(wi) >= 10.0, wi, jnp.ones_like(wi))
        wsum = jnp.maximum(jnp.sum(wi), 1e-6)
        cd = jnp.sum(d * wi[:, None], axis=0) / wsum
        sd = jnp.sqrt(2.0) / jnp.maximum(jnp.sqrt(
            jnp.sum(jnp.sum((d - cd) ** 2, axis=-1) * wi) / wsum), 1e-6)
        dn = (d - cd) * sd
        u, v = dn[:, 0], dn[:, 1]
        rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y],
                           axis=-1)
        rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y],
                           axis=-1)
        A = jnp.concatenate([rows_u, rows_v], axis=0)       # (2N, 8)
        b = jnp.concatenate([u, v], axis=0)
        ww = jnp.concatenate([wi, wi])                      # (2N,)
        # Weighted normal equations; with normalized coordinates the system
        # is well-conditioned and a tiny ridge suffices.
        Aw = A * ww[:, None]
        AtA = Aw.T @ A + 1e-6 * jnp.eye(8)
        h = jnp.linalg.solve(AtA, Aw.T @ b)
        Hn = jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)
        T_dst_inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                               [0.0, 0.0, 1.0]])
        T_dst_inv = T_dst_inv.at[0, 0].set(1.0 / sd).at[1, 1].set(1.0 / sd)
        T_dst_inv = T_dst_inv.at[0, 2].set(cd[0]).at[1, 2].set(cd[1])
        return T_dst_inv @ Hn @ T_src

    return jax.vmap(solve)(dst, weights)


def _rect_shrink(h: int, w: int) -> float:
    """Pixels to shrink the delivered rect by before point inclusion: TV-L1's
    regularization bleeds the border's flow into the content for a few
    pixels.  Scaled to the frame (8 px at >=128 px frames, less on the tiny
    test geometries so small-frame grids keep enough points)."""
    return float(max(2, min(8, min(h, w) // 16)))


def _rect_mask(pts: jax.Array, rect: jax.Array, shrink: float) -> jax.Array:
    """0/1 weights for points inside a (top, left, bottom, right) rect."""
    top, left, bot, right = rect[0], rect[1], rect[2], rect[3]
    x, y = pts[..., 0], pts[..., 1]
    inside = ((x >= left + shrink) & (x <= right - shrink)
              & (y >= top + shrink) & (y <= bot - shrink))
    return inside.astype(jnp.float32)


def _normalize_h(Hm: jax.Array) -> jax.Array:
    return Hm / Hm[..., 2:3, 2:3]


# Measurement-noise floors for the stability components: motion with RMS
# below the estimation chain's own resolution is indistinguishable from a
# still camera and must score as smooth, not as white-noise shake.  Measured
# front-end accuracy on this rig (Hartley-normalized fit over TV-L1 +
# phase-correlation): per-frame translation error std 0.06-0.08 px, rotation
# error std ~5e-4 rad; the floors sit just above that.  Without a floor the
# MIN over components is dominated by whichever component has no true motion
# (pure flat-spectrum noise scored 0.07 on clips whose moving component
# measured 0.99).
_NOISE_FLOOR_PX = 0.1
_NOISE_FLOOR_RAD = 0.002


def stability_score(Hs: jax.Array, band_edge: int = 6) -> jax.Array:
    """Spectral smoothness of the camera motion (higher = steadier, (0, 1]).

    A VELOCITY-SPECTRUM VARIANT of the Bundled-Camera-Paths frequency-
    domain analysis (Sec. 6; the metric family the StabNet paper compares
    with) — absolute values are NOT comparable to published BCP/StabNet
    stability numbers (published scores cluster ~0.6-0.9; this variant's
    honest scale runs ~0.01-0.12, with the ordering preserved): take the
    inter-frame translation (tx, ty) and rotation components as 1-D
    signals and score each as the energy of the lowest `band_edge - 1`
    non-DC frequency components over the total non-DC energy; the final
    score is the minimum of the three component scores.

    Deliberate choice, measured on this rig: the ratio is computed on the
    per-frame MOTION (velocity) series directly, NOT on its cumulative
    path.  Accumulating first turns any low-frequency DRIFT into a 1/f^2
    spectrum that dominates the ratio — a random-weights control whose
    output drifts with the scene content scored 0.86-0.88 on the
    cumulative-path variant while visibly jittering (its measured motion
    std was HIGHER than the input's).  On the velocity series, drift lands
    in the excluded DC bin, white shake stays spectrally flat (low score),
    and a smoothly-varying motion concentrates in the low bins (high
    score) — the discrimination the score exists for.

    Args:
      Hs: (T-1, 3, 3) inter-frame homographies of the OUTPUT video
        (frame t -> t+1).  The score discriminates only when the clip is
        longer than ~2x the low band (T >~ 15); shorter clips saturate
        at 1.0.
      band_edge: highest frequency bin (1-indexed, DC = 1) counted as
        "low"; 6 follows the Bundled-Camera-Paths convention.
    """
    Hn = _normalize_h(Hs)
    tx = Hn[:, 0, 2]
    ty = Hn[:, 1, 2]
    rot = jnp.arctan2(Hn[:, 1, 0], Hn[:, 0, 0])

    def score(delta, sigma0):
        n = delta.shape[0]
        spec = jnp.abs(jnp.fft.rfft(delta)) ** 2
        non_dc = spec[1:]
        low = jnp.sum(non_dc[:band_edge - 1])
        total = jnp.sum(non_dc)
        # Noise-floor regularization: E0 is the half-spectrum energy of a
        # white series with std `sigma0` (Parseval: full-spectrum energy
        # n^2 sigma0^2).  Counting it as SMOOTH energy in both numerator
        # and denominator means: components at/below the floor score ~1
        # (tripod, constant-velocity pan, or simply 'too still to
        # measure'), components far above it get the plain energy ratio.
        e0 = 0.5 * n * n * sigma0 * sigma0
        return (low + e0) / (total + e0)

    return jnp.minimum(
        jnp.minimum(score(tx, _NOISE_FLOOR_PX), score(ty, _NOISE_FLOOR_PX)),
        score(rot, _NOISE_FLOOR_RAD))


def distortion_score(Hs: jax.Array) -> jax.Array:
    """Anisotropy of the input->output mapping (higher = less distortion).

    Per frame: the ratio of the two singular values of the affine part of
    the homography fitted from the input frame to its stabilized output;
    the clip score is the worst (minimum) frame ratio — the convention from
    Bundled Camera Paths.

    Args:
      Hs: (T, 3, 3) per-frame input->output homographies.
    """
    A = _normalize_h(Hs)[:, :2, :2]
    s = jnp.linalg.svd(A, compute_uv=False)                 # (T, 2), desc
    ratio = s[:, 1] / jnp.maximum(s[:, 0], 1e-12)
    return jnp.min(ratio)


def cropping_score(Hs: jax.Array) -> jax.Array:
    """Retained-scale of the input->output mapping (higher = less cropping).

    Per frame: sqrt(|det A|) of the affine part — the isotropic scale of the
    fitted input->output mapping (a stabilizer crops by zooming in, which
    makes this scale > 1, so the score is 1/scale, clipped at 1); the clip
    score is the mean over frames.

    Args:
      Hs: (T, 3, 3) per-frame input->output homographies.
    """
    A = _normalize_h(Hs)[:, :2, :2]
    det = jnp.abs(A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
    scale = jnp.sqrt(jnp.maximum(det, 1e-12))
    return jnp.mean(jnp.minimum(1.0 / jnp.maximum(scale, 1e-6), 1.0))


# Evaluation is offline: run the flow solver at full quality (the training
# pipeline's reduced finest-level iteration budget trades accuracy for step
# time; here the small path noise it adds would bleed into the scores).
_FLOW_KW = (("fine_iters", 100),)


def _global_shift(a: jax.Array, b: jax.Array,
                  max_frac: float = 0.3) -> Tuple[jax.Array, jax.Array]:
    """Integer global translation per frame pair via windowed phase correlation.

    TV-L1 alone under-measures large per-frame jumps (measured against the
    analytic path anchor: a white-noise +-2.5 px path at 96x128 scored 0.86
    where the closed form gives 0.27 — the warping linearization saturates
    near ~4 px/frame and the 'residual' shake silently vanishes, inflating
    the stability of SHAKY clips).  Phase correlation recovers the global
    integer shift exactly regardless of magnitude; TV-L1 then refines the
    small residual it is good at.  This is the standard coarse-to-fine
    global-motion prior, done with an O(HW log HW) FFT instead of a deeper
    pyramid (measured: extra pyramid levels/warps do not fix saturation).

    Args:
      a, b: (C, H, W) frames.
      max_frac: plausible-shift bound as a fraction of each dimension
        (rejects periodic-texture alias peaks beyond it).

    Returns:
      (sx, sy): (C,) integer arrays; content at p in `a` sits at p + s in `b`.
    """
    H, W = a.shape[1:]
    win = (jnp.hanning(H)[:, None] * jnp.hanning(W)[None, :]).astype(a.dtype)
    fa = jnp.fft.rfft2(a * win)
    fb = jnp.fft.rfft2(b * win)
    cross = fb * jnp.conj(fa)
    r = jnp.fft.irfft2(cross / (jnp.abs(cross) + 1e-9), s=(H, W))  # (C, H, W)
    wrap_y = jnp.minimum(jnp.arange(H), H - jnp.arange(H))
    wrap_x = jnp.minimum(jnp.arange(W), W - jnp.arange(W))
    allowed = ((wrap_y[:, None] <= H * max_frac)
               & (wrap_x[None, :] <= W * max_frac))
    r = jnp.where(allowed, r, -jnp.inf)
    idx = jnp.argmax(r.reshape(r.shape[0], -1), axis=-1)
    sy = idx // W
    sx = idx % W
    sy = jnp.where(sy > H // 2, sy - H, sy)
    sx = jnp.where(sx > W // 2, sx - W, sx)
    return sx.astype(jnp.int32), sy.astype(jnp.int32)


def _roll2(x: jax.Array, sx: jax.Array, sy: jax.Array) -> jax.Array:
    """Per-frame circular shift of (C, H, W) by traced per-frame amounts."""
    H, W = x.shape[1:]

    def one(img, dx, dy):
        iy = (jnp.arange(H) + dy) % H
        ix = (jnp.arange(W) + dx) % W
        return img[iy][:, ix]

    return jax.vmap(one)(x, sx, sy)


# Frame pairs are processed in fixed-size chunks (padding the tail by
# repeating the last pair) so the heavy TV-L1 program compiles ONCE, not once
# per distinct clip length — a batch of mixed-length videos would otherwise
# spend most of its wall time recompiling.  Spatial dims are already fixed
# (model scale) by the callers.
_EVAL_CHUNK = 32


@functools.partial(jax.jit,
                   static_argnames=("flow_kwargs", "prealign"))
def _pairs_h_chunk(a: jax.Array, b: jax.Array, rect: jax.Array = None,
                   prealign: bool = False,
                   flow_kwargs=_FLOW_KW) -> jax.Array:
    """(C, H, W) frame pairs -> (C, 3, 3) homographies mapping a -> b.

    With `rect` (a (4,) [top, left, bottom, right] array), the fit is
    restricted to correspondences landing inside the rect — the delivered
    crop region.  The rect is a traced ARGUMENT, not a static, so per-clip
    rects do not recompile the heavy TV-L1 program.  Two callers, two
    rect treatments: the cross-video input->output fit passes the input
    full-frame and masks only the destination points; the inter-frame
    stability path (`_interframe_h`) first replaces the static black
    canvas outside the rect by edge replication (`_rect_fill`) AND passes
    the rect — measured on this rig, a fit computed on raw black-canvas
    frames is contaminated by the static border regardless of point
    masking, so both defenses are applied there.

    With `prealign` (the inter-frame stability path), the global integer
    shift is removed by phase correlation first and added back after the
    TV-L1 refinement — without it, shake beyond ~4 px/frame saturates the
    flow and the measured path comes out falsely smooth (`_global_shift`).
    Grid points whose pre-aligned source wraps around the frame edge are
    weighted out of the fit.
    """
    H, W = a.shape[1:]
    w = None
    if prealign:
        sx, sy = _global_shift(a, b)
        b = _roll2(b, sx, sy)
    u = tvl1_flow(a, b, **dict(flow_kwargs))
    src, dst = _grid_correspondences(u)
    if prealign:
        dst = dst + jnp.stack([sx, sy], axis=-1)[:, None, :].astype(dst.dtype)
        x, y = src[:, 0], src[:, 1]
        valid = ((x[None, :] + sx[:, None] >= 0)
                 & (x[None, :] + sx[:, None] <= W - 1)
                 & (y[None, :] + sy[:, None] >= 0)
                 & (y[None, :] + sy[:, None] <= H - 1))
        w = valid.astype(jnp.float32)
    if rect is not None:
        shrink = _rect_shrink(H, W)
        wr = _rect_mask(dst, rect, shrink)                  # (C, N)
        w = wr if w is None else w * wr
    return fit_homographies(src, dst, w)


def _pairs_h(a: jax.Array, b: jax.Array, rect=None,
             prealign: bool = False) -> jax.Array:
    a = np.asarray(a)
    b = np.asarray(b)
    if rect is not None:
        rect = jnp.asarray(rect, jnp.float32)
    out = []
    for s in range(0, a.shape[0], _EVAL_CHUNK):
        ca, cb = a[s:s + _EVAL_CHUNK], b[s:s + _EVAL_CHUNK]
        k = ca.shape[0]
        if k < _EVAL_CHUNK:
            reps = (_EVAL_CHUNK - k,) + (1,) * (ca.ndim - 1)
            ca = np.concatenate([ca, np.tile(ca[-1:], reps)])
            cb = np.concatenate([cb, np.tile(cb[-1:], reps)])
        out.append(np.asarray(_pairs_h_chunk(ca, cb, rect,
                                             prealign=prealign))[:k])
    return jnp.asarray(np.concatenate(out))


def _interframe_h(frames: jax.Array, rect=None) -> jax.Array:
    """(T, H, W) gray frames -> (T-1, 3, 3) inter-frame homographies.

    With `rect`, the black canvas outside the delivered region is first
    replaced by edge replication (`_rect_fill`) so the static border
    cannot corrupt the motion estimators, and the fit is restricted to
    points inside the rect.
    """
    if rect is not None:
        frames = _rect_fill(np.asarray(frames), rect)
    return _pairs_h(frames[:-1], frames[1:], rect, prealign=True)


def _crossvideo_h(a: jax.Array, b: jax.Array, rect=None) -> jax.Array:
    """Per-frame homographies mapping video `a` frames to video `b` frames."""
    return _pairs_h(a, b, rect)


def evaluate_clip(output_gray: jax.Array,
                  input_gray: jax.Array = None,
                  rect=None) -> Dict[str, float]:
    """Score one stabilized clip.

    Args:
      output_gray: (T, H, W) stabilized grayscale frames (any affine range).
      input_gray: optional (T, H, W) original frames; enables the cropping
        and distortion scores (they compare input to output).
      rect: optional (top, left, bottom, right) delivered-crop bounds in
        output pixel coordinates.  The Bundled-Camera-Paths scores are
        defined on the video a stabilizer DELIVERS — the reference writes
        exactly this crop as `..._cut.avi` (deploy_bundle.py:344-371).
        With `rect`, correspondences are restricted to the delivered
        region, so black-canvas areas and their flow-contaminated margins
        contribute nothing to the fit (measured: the rect-restricted score
        lands closer to an analytic path anchor than the full-grid score;
        tests/test_metrics.py).

    Returns:
      dict with `stability` and, when input_gray is given, `cropping` and
      `distortion` — all in (0, 1], higher is better.
    """
    out = {}
    with _on_metric_device():
        Hs_inter = _interframe_h(output_gray, rect)
        out["stability"] = float(stability_score(Hs_inter))
        if input_gray is not None:
            Hs_cross = _crossvideo_h(input_gray, output_gray, rect)
            out["cropping"] = float(cropping_score(Hs_cross))
            out["distortion"] = float(distortion_score(Hs_cross))
    return out


# Scoring runs at a capped working resolution: the CPU-pinned TV-L1 chain
# costs ~11 s per 120-frame clip at 48x64 and scales with pixel count, so
# full v2_93 288x512 frames would take ~20 min per clip.  The spectral
# stability ratio and the anisotropy/scale scores are resolution-normalized
# (paths scale linearly, ratios cancel), so a fixed working area is the
# standard way to make clips comparable.  57600 px = 180x320.
_EVAL_MAX_AREA = 180 * 320


def _eval_downscale(h: int, w: int) -> int:
    ds = 1
    while (h // ds) * (w // ds) > _EVAL_MAX_AREA:
        ds *= 2
    return ds


def score_stabilized_clip(output_frames, input_gray, model_hw: Tuple[int, int],
                          crop_rect: Tuple[int, int, int, int] = None,
                          include_input_stability: bool = True,
                          ) -> Dict[str, float]:
    """The full per-clip quality record the CLI and the quality gate share.

    One call turns any stabilize run into quality evidence: the stabilized
    output is rescored at the evaluation scale (model scale, downscaled to
    at most `_EVAL_MAX_AREA` pixels) against the same-scale input stream
    (exactly what the quality gate measures), plus the input's own stability
    as the improvement anchor and the retained crop area when the exact
    black-border rect is known (the reference's _cut.avi crop,
    deploy_bundle.py:344-371).

    Args:
      output_frames: (T, Ho, Wo, 3) uint8 stabilized color frames (any size).
      input_gray: (T, H, W) model-scale grayscale input frames.
      model_hw: (H, W) model scale for rescoring the output.
      crop_rect: optional (top, left, bottom, right) max-clear-rect at
        model scale.

    Returns:
      dict with stability / cropping / distortion / stability_input and,
      when crop_rect is given, crop_area — all in (0, 1], higher is better.
    """
    import cv2

    from stabnet_tpu.stream.video_io import to_gray_train

    h, w = model_hw
    ds = _eval_downscale(h, w)
    eh, ew = h // ds, w // ds
    out_gray = np.stack([to_gray_train(np.asarray(f), eh, ew)
                         for f in output_frames])
    input_gray = np.asarray(input_gray)
    if ds > 1:
        input_gray = np.stack([
            cv2.resize(f, (ew, eh), interpolation=cv2.INTER_AREA)
            for f in input_gray])
    n = min(len(out_gray), len(input_gray))
    rect = None
    if crop_rect is not None:
        top, left, bot, right = crop_rect
        rect = (top // ds, left // ds, bot // ds, right // ds)
    scores = evaluate_clip(out_gray[:n], input_gray[:n], rect=rect)
    if include_input_stability:  # skippable: it costs a full flow pass
        scores["stability_input"] = float(
            evaluate_clip(input_gray[:n])["stability"])
    if crop_rect is not None:
        top, left, bot, right = crop_rect
        scores["crop_area"] = float(
            (bot - top + 1) * (right - left + 1) / (h * w))
    return scores
