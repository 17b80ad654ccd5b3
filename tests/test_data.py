"""Data layer tests: augmentation consistency properties, records round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.data import augment
from stabnet_tpu.data.records import (
    iterate_examples,
    write_synthetic_dataset,
)
from stabnet_tpu.data.synthetic import make_raw_batch, make_raw_example

CFG = get_config("tiny")


def test_raw_example_shapes():
    ex = make_raw_example(CFG, seed=0)
    bc = CFG.before_ch
    assert ex["stable"].dtype == np.uint8
    assert ex["stable"].shape == (CFG.height, CFG.width, 2 * (bc + 1))
    assert ex["unstable"].shape == (CFG.height, CFG.width, 2)
    assert ex["flow"].shape == (CFG.height, CFG.width, 2)
    assert ex["matches1"].shape == (CFG.max_matches, 4)
    assert ex["mask1"].dtype == np.bool_


def test_augment_example_shapes_and_range():
    ex = augment.prepare_raw(make_raw_example(CFG, seed=1))
    ex = {k: jnp.asarray(v) for k, v in ex.items()}
    out = augment.augment_example(jax.random.PRNGKey(0), ex, CFG)
    assert out["x1"].shape == (CFG.height, CFG.width, CFG.in_channels)
    assert out["y1"].shape == (CFG.height, CFG.width, 1)
    assert out["flow"].shape == (CFG.height, CFG.width, 2)
    # Frame channels clipped to model range (mask channels are 0/1).
    bc = CFG.before_ch
    frames = out["x1"][..., bc:]
    assert float(jnp.max(frames)) <= 0.5 + 1e-6
    assert float(jnp.min(frames)) >= -1.0 - 1e-6  # -1 for masked pixels
    assert float(jnp.min(out["y1"])) >= -0.5 - 1e-6


def test_augment_geometry_consistency():
    """A bright dot placed in the image must land where the point transform
    says it lands (the reference couples image/point augmentation via shared
    seeds; get_data_mini_after.py:228-252)."""
    cfg = CFG
    for trial in range(4):
        img = np.full((cfg.height, cfg.width, 1), -0.5, np.float32)
        py, px = cfg.height // 2 + trial * 2, cfg.width // 2 - trial * 3
        img[py - 1 : py + 2, px - 1 : px + 2] = 0.5
        # NDC of the dot center under the reference's (x+1)*W/2 convention:
        nx = px / cfg.width * 2 - 1 + 1.0 / cfg.width
        ny = py / cfg.height * 2 - 1 + 1.0 / cfg.height

        key = jax.random.PRNGKey(trial)
        p = augment.draw_params(key, cfg)
        warped = augment.warp_img(jnp.asarray(img), p, cfg)
        pts = jnp.asarray([[nx, ny, nx, ny]], jnp.float32)
        out_pts, mask = augment.warp_points(
            pts, jnp.asarray([True]), p, cfg
        )
        if not bool(mask[0]):
            continue
        ox, oy = float(out_pts[0, 0]), float(out_pts[0, 1])
        ax = int(round((ox + 1) / 2 * cfg.width))
        ay = int(round((oy + 1) / 2 * cfg.height))
        ax = np.clip(ax, 1, cfg.width - 2)
        ay = np.clip(ay, 1, cfg.height - 2)
        region = np.asarray(warped[ay - 3 : ay + 4, ax - 3 : ax + 4, 0])
        assert region.max() > 0.0, f"trial {trial}: dot not found at mapped point"


def test_history_masks():
    key = jax.random.PRNGKey(3)
    hist = jnp.zeros((CFG.height, CFG.width, CFG.before_ch), jnp.float32)
    frames, masks = augment.add_history_masks(key, hist, CFG)
    assert frames.shape == hist.shape
    assert masks.shape == hist.shape
    m = np.asarray(masks)
    f = np.asarray(frames)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    # Masked pixels are painted -1.
    np.testing.assert_allclose(f[m == 1.0], -1.0)
    np.testing.assert_allclose(f[m == 0.0], 0.0)


def test_records_roundtrip(tmp_path):
    path = str(tmp_path / "ds")
    write_synthetic_dataset(path, CFG, num_examples=5, shard_size=2)
    assert os.path.exists(os.path.join(path, "list.txt"))
    got = list(iterate_examples(path, epochs=1, shuffle=False))
    assert len(got) == 5
    ex = make_raw_example(CFG, seed=0)
    np.testing.assert_allclose(got[0]["stable"], ex["stable"])


def test_augment_batch_batched():
    raw = augment.prepare_raw(make_raw_batch(CFG, 2, seed=7))
    raw = {k: jnp.asarray(v) for k, v in raw.items()}
    out = augment.augment_batch(jax.random.PRNGKey(0), raw, CFG)
    assert out["x1"].shape == (2, CFG.height, CFG.width, CFG.in_channels)
    # Different examples get different augmentation draws.
    assert not np.allclose(np.asarray(out["x1"][0]), np.asarray(out["x1"][1]))


def test_pipeline_start_step_decorrelates(tmp_path):
    """A resumed pipeline (start_step>0) continues with a fresh stream; the
    same (seed, start_step) reproduces exactly — so save/restore chains
    (scripts/train_chain.sh) never replay the stream head."""
    from stabnet_tpu.data.pipeline import InputPipeline

    path = str(tmp_path / "train")
    write_synthetic_dataset(path, CFG, num_examples=6, shard_size=3)

    def first_batch(start_step):
        return np.asarray(
            next(iter(InputPipeline(path, CFG, seed=0, batch_size=2,
                                    start_step=start_step)))["x1"])

    a = first_batch(0)
    b = first_batch(100)
    c = first_batch(0)
    np.testing.assert_allclose(a, c)
    assert not np.allclose(a, b)
