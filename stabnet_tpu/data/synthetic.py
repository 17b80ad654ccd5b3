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
               jitter: float = 0.0, channels: int = 3,
               return_offsets: bool = False) -> np.ndarray:
    """(T, H, W, C) uint8 synthetic clip: drifting sinusoid texture + boxes.

    With `return_offsets`, also returns the per-frame (dx, dy) translation of
    the texture — the exact motion ground truth, from which consistent
    optical flow and feature matches can be derived (`make_raw_example`).
    Two clips with the same seed share drift and texture; `jitter` adds
    independent per-frame shake on top (the "unstable" camera).

    The whole frame (sinusoid texture AND the high-contrast box) translates
    rigidly by the returned offset: content at coordinate q sits at pixel
    q - offset[t].  Nothing moves against the global motion, so a
    translation-only flow/match model is EXACT — a frame-flipping or
    independently-moving box would make the temporal/feature losses
    unsatisfiable and synthetic training would diverge once they gate in.
    The box is drawn as a (width, height)-periodic pattern in CONTENT
    coordinates, so when drift carries it past a frame edge it re-enters
    split across the opposite edge (like the periodic sinusoid) instead of
    teleporting — a jump would locally break the rigid-translation
    guarantee right where the high-gradient pixels are.
    """
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    phase_x = rng.uniform(0, 2 * np.pi)
    phase_y = rng.uniform(0, 2 * np.pi)
    out = np.zeros((num_frames, height, width, channels), np.uint8)
    drift = np.cumsum(rng.uniform(-1.5, 1.5, (num_frames, 2)), axis=0)
    shake = rng.uniform(-jitter, jitter, (num_frames, 2)) if jitter else np.zeros((num_frames, 2))
    offsets = drift + shake
    box_color = 255 if seed % 2 == 0 else 0        # seed-, not frame-, keyed
    cbx = (17 * seed + 11) % max(width - 24, 1)    # box content coordinates
    cby = (13 * seed + 7) % max(height - 20, 1)
    for t in range(num_frames):
        dx, dy = offsets[t]
        img = (
            127.5
            + 60 * np.sin(2 * np.pi * (xs + dx) / 37 + phase_x)
            + 50 * np.sin(2 * np.pi * (ys + dy) / 29 + phase_y)
        )
        # High-contrast box riding the global translation (content-periodic).
        in_box = (((xs + dx - cbx) % width) < 20) & (((ys + dy - cby) % height) < 16)
        img = np.where(in_box, float(box_color), img)
        out[t] = np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(channels, -1)
    if return_offsets:
        return out, offsets.astype(np.float32)
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
    """One raw Siamese example in the layout `augment_example` expects.

    The shake magnitude is drawn PER EXAMPLE from a wide range rather than
    fixed: the reference trains on DeepStab's real footage whose handheld
    shake spans calm to violent (README.md:35-37), and a model trained on a
    single synthetic magnitude learns a constant-size correction — it
    overcorrects already-steady clips (measured: the round-4 16-clip gate
    lost stability vs the INPUT on low-jitter held-out clips when every
    training example used jitter=4.0).
    """
    rng = np.random.RandomState(seed)
    jitter = float(rng.uniform(1.0, 6.0))
    span = max(cfg.indices) + 2
    stable_clip, st_off = make_video(span + 1, cfg.height, cfg.width,
                                     seed=seed, return_offsets=True)
    unstable_clip, un_off = make_video(span + 1, cfg.height, cfg.width,
                                       seed=seed, jitter=jitter,
                                       return_offsets=True)
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

    # CONSISTENT ground-truth flow (stands in for the dataset's TVL1 flow):
    # the temporal loss samples output-2 at the flow coordinates and compares
    # to output-1 (train_bundle_nobm.py:115-126), so flow(p) must be the
    # location in stable frame `pos` of the content at p in stable frame
    # pos-1.  Texture at content coordinate q sits at pixel q - d_t, hence
    # flow(p) = p + d_{pos-1} - d_pos, in the sampler's (x+1)*size/2 NDC
    # convention.  An inconsistent (random) flow makes the temporal loss
    # unsatisfiable and training diverges once it gates in.
    delta = st_off[pos - 1] - st_off[pos]                  # (dx, dy) pixels
    xp, yp = np.meshgrid(np.arange(cfg.width, dtype=np.float32),
                         np.arange(cfg.height, dtype=np.float32))
    flow = np.stack(
        [
            2.0 * (xp + delta[0]) / cfg.width - 1.0,
            2.0 * (yp + delta[1]) / cfg.height - 1.0,
        ],
        axis=-1,
    ).astype(np.float32)

    # CONSISTENT feature matches [x_stable, y_stable, x_unstable, y_unstable]:
    # the feature loss reads the predicted map at the stable point and wants
    # the matched unstable point back (s_net_bundle_nobm.py:335-343).  For a
    # pure-translation pair, p_unstable = p_stable - shake_t (shake = the
    # unstable clip's extra offset).  Small noise models SIFT localization
    # error.
    def make_matches(t):
        shake = un_off[t] - st_off[t]
        n = rng.randint(cfg.max_matches // 4, cfg.max_matches // 2)
        matches = np.zeros((cfg.max_matches, 4), np.float32)
        pts = rng.uniform(-0.9, 0.9, (n, 2)).astype(np.float32)
        noise = rng.uniform(-0.005, 0.005, (n, 2)).astype(np.float32)
        matches[:n, :2] = pts
        matches[:n, 2] = pts[:, 0] - 2.0 * shake[0] / cfg.width + noise[:, 0]
        matches[:n, 3] = pts[:, 1] - 2.0 * shake[1] / cfg.height + noise[:, 1]
        mask = np.zeros((cfg.max_matches,), np.bool_)
        mask[:n] = True
        return matches, mask

    matches1, mask1 = make_matches(pos - 1)
    matches2, mask2 = make_matches(pos)

    return {
        "stable": stable,
        "unstable": unstable,
        "flow": flow,
        "matches1": matches1,
        "mask1": mask1,
        "matches2": matches2,
        "mask2": mask2,
    }


def make_raw_batch(cfg: StabNetConfig, batch_size: int, seed: int = 0):
    exs = [make_raw_example(cfg, seed=seed * 1000 + b) for b in range(batch_size)]
    return {k: np.stack([e[k] for e in exs]) for k in exs[0]}
