"""Data-pipeline visual checks.

Equivalents of the reference's manual harnesses (get_data_mini_after.py:
`run()` dumps a batch's channel stack as summary images, `test()` renders
feature matches over a stable/unstable pair and cross-checks against raw .mat
matches; :255-323).  Here both render to image files from any record
directory, runnable via `python -m stabnet_tpu.cli.main inspect-data`.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.utils import get_logger

logger = get_logger()


def _u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img).squeeze()
    if img.dtype == np.uint8:
        g = img
    else:
        g = np.clip((img + 0.5) * 255.0, 0, 255).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=-1)


def dump_example(out_dir: str, example, cfg: StabNetConfig, name: str = "ex",
                 augmented: bool = False) -> None:
    """Write per-channel images + a match overlay for one example.

    `example` is either a raw record (keys stable/unstable/...) or an
    augmented example (keys x1/y1/...).
    """
    try:
        import cv2
    except ImportError:
        logger.warning("cv2 unavailable; skipping data dump")
        return
    os.makedirs(out_dir, exist_ok=True)

    if augmented:
        x1 = np.asarray(example["x1"])
        for c in range(x1.shape[-1]):
            cv2.imwrite(os.path.join(out_dir, f"{name}-x1-ch{c}.jpg"),
                        _u8(x1[:, :, c]))
        cv2.imwrite(os.path.join(out_dir, f"{name}-y1.jpg"),
                    _u8(np.asarray(example["y1"])))
        stable = _u8(np.asarray(example["y1"]))
        unstable = _u8(x1[:, :, cfg.cur_channel])
        matches = np.asarray(example["matches1"])
        mask = np.asarray(example["mask1"]) > 0.5
    else:
        stable_stack = np.asarray(example["stable"])
        for c in range(stable_stack.shape[-1]):
            cv2.imwrite(os.path.join(out_dir, f"{name}-stable-ch{c}.jpg"),
                        _u8(stable_stack[:, :, c]))
        unstable_stack = np.asarray(example["unstable"])
        for c in range(unstable_stack.shape[-1]):
            cv2.imwrite(os.path.join(out_dir, f"{name}-unstable-ch{c}.jpg"),
                        _u8(unstable_stack[:, :, c]))
        stable = _u8(stable_stack[:, :, 0])
        unstable = _u8(unstable_stack[:, :, 1])
        matches = np.asarray(example["matches1"])
        mask = np.asarray(example["mask1"]).astype(bool)

    # Side-by-side match rendering (reference: test(), lines drawn between
    # stable and unstable coordinates).
    H, W = stable.shape[:2]
    panel = np.concatenate([stable, unstable], axis=1)
    rng = np.random.RandomState(0)
    for (xs, ys, xu, yu), m in zip(matches, mask):
        if not m or rng.rand() > 0.1:
            continue
        p1 = (int((xs / 2 + 0.5) * W), int((ys / 2 + 0.5) * H))
        p2 = (int((xu / 2 + 0.5) * W) + W, int((yu / 2 + 0.5) * H))
        cv2.line(panel, p1, p2, tuple(int(v) for v in rng.rand(3) * 255), 1)
    cv2.imwrite(os.path.join(out_dir, f"{name}-matches.jpg"), panel)
    logger.info("wrote data dump '%s' to %s", name, out_dir)


def inspect_dataset(record_dir: str, out_dir: str, cfg: StabNetConfig,
                    num: int = 2, augment_seed: Optional[int] = 0) -> None:
    """Dump the first `num` examples raw and (optionally) augmented."""
    from stabnet_tpu.data.records import iterate_examples

    for i, ex in enumerate(iterate_examples(record_dir, epochs=1, shuffle=False)):
        if i >= num:
            break
        dump_example(out_dir, ex, cfg, name=f"raw{i}")
        if augment_seed is not None:
            import jax
            import jax.numpy as jnp

            from stabnet_tpu.data.augment import augment_example

            exf = {k: jnp.asarray(v.astype(np.float32) if v.dtype != np.bool_
                                  else v) for k, v in ex.items()}
            aug = augment_example(jax.random.PRNGKey(augment_seed + i), exf, cfg)
            dump_example(out_dir, aug, cfg, name=f"aug{i}", augmented=True)
