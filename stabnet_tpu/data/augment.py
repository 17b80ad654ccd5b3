"""Consistent data augmentation as pure JAX functions, run ON DEVICE.

Reference behavior (get_data_mini_after.py:7-147): every training example draws
ONE augmentation parameter set (resize-crop offsets, flip bit, contrast factor,
brightness delta) applied consistently to all 16 decoded frames AND to the
optical-flow map AND to both feature-match point sets, plus per-history-frame
random homography black-border masks.

TPU-native re-design: the reference runs this on 10 host threads; here the
whole augmentation is a jit/vmap-able function of (rng, raw example) executed
on device — the host only decodes and batches raw frames.  Randomness is
`jax.random` keyed per example.

Intentional deviations from the reference (no checkpoint-parity constraint on
the input pipeline; both noted for the record):
  * resize uses half-pixel-center bilinear (static-matrix contractions on the
    MXU; jax.image.resize would lower to a serial gather loop on TPU) instead
    of TF1's legacy corner-scaled bilinear;
  * the crop/flip coordinate fix-up for flow/points uses the geometrically
    correct per-axis scale (w-ratio for x, h-ratio for y); the reference uses
    the h-ratio for both axes (get_data_mini_after.py:40-41,57-58), which only
    coincides when int(height/rate)/height == int(width/rate)/width.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.ops.resize import resize_crop_hwc


def prepare_raw(raw):
    """Normalize a host raw batch's dtypes for device transfer.

    uint8 frames and bool masks stay compact (uint8 frames are converted to
    model scale on device inside `augment_example`); everything else becomes
    float32.
    """
    import numpy as np

    return jax.tree_util.tree_map(
        lambda a: a if a.dtype in (np.bool_, np.uint8) else a.astype(np.float32),
        raw,
    )


class AugParams(NamedTuple):
    """One shared parameter draw per example (reference: get_rand_para)."""

    crop_h: jax.Array    # int32 scalar in [0, big_h - height)
    crop_w: jax.Array    # int32 scalar in [0, big_w - width)
    flip: jax.Array      # bool scalar; reference uses (crop_h+crop_w) % 2
    contrast: jax.Array  # float scalar in [0.5, 1.5]
    brightness: jax.Array  # float scalar in [-32/255, 32/255]


def big_size(cfg: StabNetConfig) -> Tuple[int, int]:
    """Upscaled size before random crop (reference: get_data_mini_after.py:8-9)."""
    return int(cfg.height / cfg.random_crop_rate), int(cfg.width / cfg.random_crop_rate)


def draw_params(key: jax.Array, cfg: StabNetConfig) -> AugParams:
    kh, kw, kc, kb = jax.random.split(key, 4)
    bh, bw = big_size(cfg)
    crop_h = jax.random.randint(kh, (), 0, bh - cfg.height)
    crop_w = jax.random.randint(kw, (), 0, bw - cfg.width)
    flip = ((crop_h + crop_w) % 2).astype(jnp.bool_)
    contrast = jax.random.uniform(kc, (), minval=0.5, maxval=1.5)
    brightness = jax.random.uniform(
        kb, (), minval=-32.0 / 255.0, maxval=32.0 / 255.0
    )
    return AugParams(crop_h, crop_w, flip, contrast, brightness)


def warp_img(img: jax.Array, p: AugParams, cfg: StabNetConfig) -> jax.Array:
    """Resize-crop-flip-contrast-brightness one (H, W, C) image stack.

    All channels receive identical geometry and photometry (reference:
    warp_img with shared seed, get_data_mini_after.py:14-29).
    """
    bh, bw = big_size(cfg)
    crop = resize_crop_hwc(img, (bh, bw), p.crop_h, p.crop_w,
                           (cfg.height, cfg.width))
    crop = jnp.where(p.flip, crop[:, ::-1, :], crop)
    # tf.image.random_contrast: per-channel mean-centered scaling.
    mean = jnp.mean(crop, axis=(0, 1), keepdims=True)
    crop = (crop - mean) * p.contrast + mean
    crop = crop + p.brightness
    return jnp.clip(crop, -0.5, 0.5)


def _warp_x_coord(x: jax.Array, p: AugParams, cfg: StabNetConfig) -> jax.Array:
    """NDC x-coordinate under the shared resize-crop(-flip)."""
    bh, bw = big_size(cfg)
    ww = p.crop_w.astype(jnp.float32)
    x = (x + 1.0 - 2.0 * ww / bw) * (bw / cfg.width) - 1.0
    return jnp.where(p.flip, -x - 1.0 / cfg.width, x)


def _warp_y_coord(y: jax.Array, p: AugParams, cfg: StabNetConfig) -> jax.Array:
    bh, bw = big_size(cfg)
    hh = p.crop_h.astype(jnp.float32)
    return (y + 1.0 - 2.0 * hh / bh) * (bh / cfg.height) - 1.0


def warp_flow(flow: jax.Array, p: AugParams, cfg: StabNetConfig) -> jax.Array:
    """Transform a dense NDC correspondence map (H, W, 2) consistently.

    The flow VALUES are NDC coordinates into the other frame, so they get the
    same coordinate transform as points; the flow FIELD is resampled like an
    image (reference: warp_flow, get_data_mini_after.py:31-48).
    """
    bh, bw = big_size(cfg)
    crop = resize_crop_hwc(flow, (bh, bw), p.crop_h, p.crop_w,
                           (cfg.height, cfg.width))
    fx = _warp_x_coord(crop[..., 0], p._replace(flip=jnp.asarray(False)), cfg)
    fy = _warp_y_coord(crop[..., 1], p, cfg)
    # Under flip, the field is mirrored and x-values mirrored (reference:
    # get_data_mini_after.py:43-47).
    fx_flipped = -fx[:, ::-1] - 1.0 / cfg.width
    fy_flipped = fy[:, ::-1]
    fx = jnp.where(p.flip, fx_flipped, fx)
    fy = jnp.where(p.flip, fy_flipped, fy)
    return jnp.stack([fx, fy], axis=-1)


def warp_points(points: jax.Array, mask: jax.Array, p: AugParams,
                cfg: StabNetConfig) -> Tuple[jax.Array, jax.Array]:
    """Transform match points (N, 4)=[xs, ys, xu, yu]; drop out-of-frame ones.

    Reference: warp_point, get_data_mini_after.py:50-65.
    """
    xs = _warp_x_coord(points[:, 0], p, cfg)
    ys = _warp_y_coord(points[:, 1], p, cfg)
    xu = _warp_x_coord(points[:, 2], p, cfg)
    yu = _warp_y_coord(points[:, 3], p, cfg)
    out = jnp.stack([xs, ys, xu, yu], axis=1)
    in_bounds = jnp.all((out >= -1.0) & (out <= 1.0), axis=1)
    return out, jnp.logical_and(in_bounds, mask)


# --- synthetic black-border history masking ----------------------------------

def rand_homography(key: jax.Array, cfg: StabNetConfig) -> jax.Array:
    """Random 3x3 within [rand_H_min, rand_H_max] (reference: get_rand_H)."""
    lo = jnp.asarray(cfg.rand_h_min(), jnp.float32)
    hi = jnp.asarray(cfg.rand_h_max(), jnp.float32)
    u = jax.random.uniform(key, (3, 3))
    return lo + u * (hi - lo)


def homography_oob_mask(H: jax.Array, height: int, width: int) -> jax.Array:
    """(height, width) float mask: 1.0 where H sends the NDC grid out of frame.

    Reference: get_rand_mask (get_data_mini_after.py:93-108); note the
    reference uses a plain z divide here (no sign-eps guard).
    """
    xs = jnp.linspace(-1.0, 1.0, width)
    ys = jnp.linspace(-1.0, 1.0, height)
    xg, yg = jnp.meshgrid(xs, ys)
    pts = jnp.stack([xg, yg, jnp.ones_like(xg)], axis=-1)     # (H, W, 3)
    q = jnp.einsum("ij,hwj->hwi", H, pts,
                   precision=jax.lax.Precision.HIGHEST)
    x = q[..., 0] / q[..., 2]
    y = q[..., 1] / q[..., 2]
    oob = (x < -1) | (x > 1) | (y < -1) | (y > 1)
    return oob.astype(jnp.float32)


def add_history_masks(key: jax.Array, history: jax.Array,
                      cfg: StabNetConfig) -> Tuple[jax.Array, jax.Array]:
    """Paint random black borders onto history frames; return (frames, masks).

    history: (H, W, before_ch).  Each history channel gets an independent
    random homography OOB mask (rand_H_change_rate == 1 in v2_93 makes the
    random walk degenerate to i.i.d. draws); masked pixels are set to -1
    (reference: add_mask, get_data_mini_after.py:127-147).
    """
    keys = jax.random.split(key, cfg.before_ch)
    Hs = jax.vmap(lambda k: rand_homography(k, cfg))(keys)
    if cfg.rand_H_change_rate != 1.0:
        # Smooth the sequence: H_i <- r*H_i + (1-r)*H_{i-1}  (reference:
        # get_rand_H second branch).
        r = cfg.rand_H_change_rate

        def smooth(carry, H):
            Hn = H * r + carry * (1 - r)
            return Hn, Hn

        _, Hs = jax.lax.scan(smooth, Hs[0], Hs)
    masks = jax.vmap(lambda H: homography_oob_mask(H, cfg.height, cfg.width))(Hs)
    masks = jnp.moveaxis(masks, 0, -1)                         # (H, W, before_ch)
    frames = history * (1.0 - masks) + masks * (-1.0)
    return frames, masks


# --- full example augmentation ------------------------------------------------

def augment_example(key: jax.Array, raw: Dict[str, jax.Array],
                    cfg: StabNetConfig) -> Dict[str, jax.Array]:
    """Raw decoded example -> Siamese training example.

    Raw layout (built by the record reader, mirroring
    get_data_mini_after.py:178-226):
      stable:   (H, W, 2*(before_ch+1)); channels [0..bc] are frames at
                pos-1-indices[k] (current stable first), [bc+1..] same for pos.
      unstable: (H, W, 2) frames at pos-1 and pos.
      flow:     (H, W, 2) NDC correspondence map between the stable pair.
      matches1, matches2: (max_matches, 4); mask1, mask2: (max_matches,) bool.

    Returns dict x1, y1, x2, y2, flow, matches1, mask1, matches2, mask2 with
    x* of shape (H, W, in_channels).
    """
    k_par, k_m1, k_m2 = jax.random.split(key, 3)
    p = draw_params(k_par, cfg)

    def to_model_scale(a):
        # Records store frames as uint8 (4x cheaper host->device transfer);
        # model scale is [-0.5, 0.5] (reference: get_img,
        # get_data_mini_after.py:149-156).
        if a.dtype == jnp.uint8:
            return a.astype(jnp.float32) / 255.0 - 0.5
        return a

    stable = warp_img(to_model_scale(raw["stable"]), p, cfg)
    unstable = warp_img(to_model_scale(raw["unstable"]), p, cfg)

    bc = cfg.before_ch
    y1 = stable[..., 0:1]
    hist1 = stable[..., 1 : 1 + bc]
    y2 = stable[..., bc + 1 : bc + 2]
    hist2 = stable[..., bc + 2 : 2 * bc + 2]
    cur1 = unstable[..., 0:1]
    cur2 = unstable[..., 1:2]

    frames1, masks1 = add_history_masks(k_m1, hist1, cfg)
    frames2, masks2 = add_history_masks(k_m2, hist2, cfg)

    if cfg.input_mask:
        x1 = jnp.concatenate([masks1, frames1, cur1], axis=-1)
        x2 = jnp.concatenate([masks2, frames2, cur2], axis=-1)
    else:
        x1 = jnp.concatenate([frames1, cur1], axis=-1)
        x2 = jnp.concatenate([frames2, cur2], axis=-1)

    matches1, mask1 = warp_points(raw["matches1"], raw["mask1"], p, cfg)
    matches2, mask2 = warp_points(raw["matches2"], raw["mask2"], p, cfg)

    out = {
        "x1": x1, "y1": y1, "x2": x2, "y2": y2,
        "matches1": matches1, "mask1": mask1.astype(jnp.float32),
        "matches2": matches2, "mask2": mask2.astype(jnp.float32),
    }
    # Flow is optional: pipelines that recompute it on device (TV-L1 between
    # the augmented stable pair) skip warping a field whose value would be
    # discarded — and skip its host build + upload entirely.
    if "flow" in raw:
        out["flow"] = warp_flow(raw["flow"], p, cfg)
    return out


def augment_batch(key: jax.Array, raw_batch: Dict[str, jax.Array],
                  cfg: StabNetConfig) -> Dict[str, jax.Array]:
    """vmap of `augment_example` over the leading batch axis."""
    B = raw_batch["stable"].shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(lambda k, r: augment_example(k, r, cfg))(keys, raw_batch)
