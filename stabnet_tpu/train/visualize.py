"""Training debug visualizer.

Equivalent of the reference's `save_warpped_features`
(train_bundle_nobm.py:41-94): for a batch, dump per-example mosaics of
[stable | net output ; |error| | unstable+match overlays] plus the per-channel
input stacks, and the per-cell homographies as text.  Useful when eyeballing
whether the feature loss geometry is wired correctly.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.utils import get_logger

logger = get_logger()


def _to_u8(img: np.ndarray) -> np.ndarray:
    """Model-scale [-0.5, 0.5] (H, W) -> uint8 (H, W, 3)."""
    g = np.clip((np.asarray(img).squeeze() + 0.5) * 255.0, 0, 255).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=-1)


def _draw_points(img: np.ndarray, pts_ndc: np.ndarray, mask: np.ndarray,
                 color) -> np.ndarray:
    """Draw NDC points as circles (reference: draw, train_bundle_nobm.py:45-55)."""
    try:
        import cv2
    except ImportError:
        return img
    out = img.copy()
    H, W = img.shape[:2]
    px = ((pts_ndc[:, 0] / 2 + 0.5) * W).astype(np.int32)
    py = ((pts_ndc[:, 1] / 2 + 0.5) * H).astype(np.int32)
    for x, y, m in zip(px, py, mask):
        if not m:
            continue
        cv2.circle(out, (int(x), int(y)), 5, color, 1)
    return out


def save_debug_batch(out_dir: str, batch: Dict[str, np.ndarray],
                     outputs, cfg: StabNetConfig, step: int,
                     max_examples: int = 4,
                     warped_pts: Optional[np.ndarray] = None):
    """Write debug mosaics for up to `max_examples` of a Siamese batch.

    Args:
      batch: augmented training batch (x1/y1/matches1/mask1/...).
      outputs: StabNetOutput for branch 1 (x1).
      warped_pts: optional (B, N, 2) `warp_pts` gather of the maps at the
        stable match locations.

    Returns:
      The list of mosaic images written ((2H, 2W, 3) uint8 BGR each), so the
      caller can forward them to other sinks (e.g. TensorBoard).
    """
    try:
        import cv2
    except ImportError:
        logger.warning("cv2 unavailable; skipping debug dump")
        return []
    os.makedirs(out_dir, exist_ok=True)

    x1 = np.asarray(batch["x1"])
    y1 = np.asarray(batch["y1"])
    matches = np.asarray(batch["matches1"])
    mask = np.asarray(batch["mask1"]) > 0.5
    out_img = np.asarray(outputs.warp.output)
    Hs = np.asarray(outputs.warp.Hs)

    B = min(x1.shape[0], max_examples)
    mosaics = []
    for b in range(B):
        stable = _draw_points(_to_u8(y1[b]), matches[b, :, :2], mask[b],
                              (0, 0, 255))
        unstable = _to_u8(x1[b, :, :, cfg.cur_channel])
        unstable = _draw_points(unstable, matches[b, :, 2:], mask[b], (0, 255, 0))
        if warped_pts is not None:
            unstable = _draw_points(unstable, np.asarray(warped_pts)[b], mask[b],
                                    (255, 0, 0))
        net = _to_u8(out_img[b])
        err = np.abs(net.astype(np.int32) - _to_u8(y1[b]).astype(np.int32))
        top = np.concatenate([stable, net], axis=1)
        bottom = np.concatenate([err.astype(np.uint8), unstable], axis=1)
        mosaic = np.concatenate([top, bottom], axis=0)
        mosaics.append(mosaic)
        cv2.imwrite(os.path.join(out_dir, f"step{step:06d}-ex{b}.jpg"), mosaic)
        np.savetxt(os.path.join(out_dir, f"step{step:06d}-ex{b}-Hs.txt"),
                   Hs[b].reshape(-1, 9))

    # Per-channel input stack of example 0 (reference dumps x1-%d.jpg).
    for c in range(x1.shape[-1]):
        cv2.imwrite(os.path.join(out_dir, f"step{step:06d}-x1-ch{c}.jpg"),
                    _to_u8(x1[0, :, :, c]))
    logger.info("wrote debug dump for step %d to %s", step, out_dir)
    return mosaics
