"""Synthetic data generation: fake videos and raw training examples.

Used by tests and benchmarks (the reference ships none of its DeepStab data;
its manual checks rely on on-disk datasets, get_data_mini_after.py:283-323).
A synthetic "video" is a smoothly drifting textured pattern; the "unstable"
variant adds jitter, so the stabilization problem is real but tiny.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from stabnet_tpu.config import StabNetConfig


def make_video(num_frames: int, height: int, width: int, seed: int = 0,
               jitter: float = 0.0, channels: int = 3) -> np.ndarray:
    """(T, H, W, C) uint8 synthetic clip: drifting sinusoid texture + boxes."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    phase_x = rng.uniform(0, 2 * np.pi)
    phase_y = rng.uniform(0, 2 * np.pi)
    out = np.zeros((num_frames, height, width, channels), np.uint8)
    drift = np.cumsum(rng.uniform(-1.5, 1.5, (num_frames, 2)), axis=0)
    shake = rng.uniform(-jitter, jitter, (num_frames, 2)) if jitter else np.zeros((num_frames, 2))
    for t in range(num_frames):
        dx, dy = drift[t] + shake[t]
        img = (
            127.5
            + 60 * np.sin(2 * np.pi * (xs + dx) / 37 + phase_x)
            + 50 * np.sin(2 * np.pi * (ys + dy) / 29 + phase_y)
        )
        # A couple of moving high-contrast boxes for structure.
        bx = int((t * 3 + dx) % max(width - 20, 1))
        by = int((t * 2 + dy) % max(height - 16, 1))
        img[by : by + 16, bx : bx + 20] = 255 if t % 2 == 0 else 0
        out[t] = np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(channels, -1)
    return out


def to_gray_train(frame: np.ndarray) -> np.ndarray:
    """uint8 (H, W, C) -> float32 (H, W) in [-0.5, 0.5] (reference: config.py:6-21)."""
    if frame.ndim == 3:
        # BT.601 luma, matching cv2 BGR2GRAY / tf rgb_to_grayscale weights.
        b, g, r = frame[..., 0], frame[..., 1], frame[..., 2]
        gray = 0.114 * b + 0.587 * g + 0.299 * r
    else:
        gray = frame.astype(np.float32)
    return gray.astype(np.float32) / 255.0 - 0.5


def make_raw_example(cfg: StabNetConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """One raw Siamese example in the layout `augment_example` expects."""
    rng = np.random.RandomState(seed)
    span = max(cfg.indices) + 2
    stable_clip = make_video(span + 1, cfg.height, cfg.width, seed=seed)
    unstable_clip = make_video(span + 1, cfg.height, cfg.width, seed=seed,
                               jitter=4.0)
    pos = span  # last frame index

    def g(clip, t):
        return to_gray_train(clip[t])

    def to_u8(f):
        return np.clip(np.round((f + 0.5) * 255.0), 0, 255).astype(np.uint8)

    stable_ch = []
    for base in (pos - 1, pos):
        for i in cfg.indices:
            if i >= 0:
                stable_ch.append(to_u8(g(stable_clip, base - i)))
    stable = np.stack(stable_ch, axis=-1)

    unstable_ch = []
    for base in (pos - 1, pos):
        for i in cfg.indices:
            if i <= 0:
                unstable_ch.append(to_u8(g(unstable_clip, base - i)))
    unstable = np.stack(unstable_ch, axis=-1)

    # Smooth random NDC correspondence map standing in for TVL1 flow.
    gx = np.linspace(-1, 1, cfg.width, dtype=np.float32)
    gy = np.linspace(-1, 1, cfg.height, dtype=np.float32)
    fx, fy = np.meshgrid(gx, gy)
    flow = np.stack(
        [
            fx + rng.uniform(-0.01, 0.01) + 0.005 * np.sin(fy * 3),
            fy + rng.uniform(-0.01, 0.01) + 0.005 * np.cos(fx * 3),
        ],
        axis=-1,
    ).astype(np.float32)

    n = rng.randint(cfg.max_matches // 4, cfg.max_matches // 2)
    matches = np.zeros((cfg.max_matches, 4), np.float32)
    pts = rng.uniform(-0.95, 0.95, (n, 2)).astype(np.float32)
    offs = rng.uniform(-0.02, 0.02, (n, 2)).astype(np.float32)
    matches[:n, :2] = pts
    matches[:n, 2:] = pts + offs
    mask = np.zeros((cfg.max_matches,), np.bool_)
    mask[:n] = True

    return {
        "stable": stable,
        "unstable": unstable,
        "flow": flow,
        "matches1": matches,
        "mask1": mask,
        "matches2": matches.copy(),
        "mask2": mask.copy(),
    }


def make_raw_batch(cfg: StabNetConfig, batch_size: int, seed: int = 0):
    exs = [make_raw_example(cfg, seed=seed * 1000 + b) for b in range(batch_size)]
    return {k: np.stack([e[k] for e in exs]) for k in exs[0]}
