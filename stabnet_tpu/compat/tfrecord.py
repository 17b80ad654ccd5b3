"""Reader for the reference's original TFRecord training data (gated on TF).

Schema (reference: get_data_mini_after.py:168-176): each example stores frame
PATHS (stable/unstable video frame directories), the sample position, a dense
flow map, and two variable-length feature-match lists.  This reader decodes
the referenced JPEGs and materializes raw examples in the layout expected by
`stabnet_tpu.data.augment.augment_example`, so existing DeepStab TFRecord
datasets can be converted into the framework's npz shard format with
`convert_dataset`.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List

import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.data.records import write_shards


def _tf():
    try:
        import tensorflow as tf

        return tf
    except ImportError as e:
        raise RuntimeError("TensorFlow required to read reference TFRecords") from e


def _decode_gray(tf, path: str, height: int, width: int) -> np.ndarray:
    """JPEG -> (H, W) float32 in [-0.5, 0.5] (reference: get_img,
    get_data_mini_after.py:149-156)."""
    data = tf.io.read_file(path)
    img = tf.io.decode_jpeg(data)
    img = tf.image.rgb_to_grayscale(img)
    img = tf.image.convert_image_dtype(img, tf.float32)
    img = tf.image.resize(img, (height, width), method="bilinear")
    return np.asarray(img)[..., 0] - 0.5


def iterate_reference_examples(record_dir: str, cfg: StabNetConfig
                               ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield raw examples from a reference-format record directory.

    `record_dir` must contain `list.txt` naming TFRecord files (reference:
    get_data_mini_after.py:158-163) and the frame paths stored inside the
    records must be resolvable.
    """
    tf = _tf()
    with open(os.path.join(record_dir, "list.txt")) as f:
        files = [os.path.join(record_dir, n.strip()) for n in f.read().split()]

    feature_spec = {
        "stable_path": tf.io.FixedLenFeature([], tf.string),
        "unstable_path": tf.io.FixedLenFeature([], tf.string),
        "pos": tf.io.FixedLenFeature([], tf.int64),
        "flow": tf.io.VarLenFeature(tf.float32),
        "feature_matches1": tf.io.VarLenFeature(tf.float32),
        "feature_matches2": tf.io.VarLenFeature(tf.float32),
    }

    for rec in tf.data.TFRecordDataset(files):
        ex = tf.io.parse_single_example(rec, feature_spec)
        pos = int(ex["pos"])
        stable_path = ex["stable_path"].numpy().decode()
        unstable_path = ex["unstable_path"].numpy().decode()

        def img(base, t):
            return _decode_gray(tf, f"{base}{t}.jpg", cfg.height, cfg.width)

        stable: List[np.ndarray] = []
        for basepos in (pos - 1, pos):
            for i in cfg.indices:
                if i >= 0:
                    stable.append(img(stable_path, basepos - i))
        unstable: List[np.ndarray] = []
        for basepos in (pos - 1, pos):
            for i in cfg.indices:
                if i <= 0:
                    unstable.append(img(unstable_path, basepos - i))

        flow = tf.sparse.to_dense(ex["flow"]).numpy().reshape(
            cfg.height, cfg.width, -1)[:, :, :2]

        def matches(key):
            m = tf.sparse.to_dense(ex[key]).numpy().reshape(-1, 4)
            assert m.shape[0] < cfg.max_matches, "too many matches"
            out = np.zeros((cfg.max_matches, 4), np.float32)
            out[: m.shape[0]] = m
            mask = np.zeros((cfg.max_matches,), np.bool_)
            mask[: m.shape[0]] = True
            return out, mask

        m1, k1 = matches("feature_matches1")
        m2, k2 = matches("feature_matches2")
        def to_u8(stack):
            arr = np.stack(stack, axis=-1)
            return np.clip(np.round((arr + 0.5) * 255.0), 0, 255).astype(np.uint8)

        yield {
            "stable": to_u8(stable),
            "unstable": to_u8(unstable),
            "flow": flow.astype(np.float32),
            "matches1": m1, "mask1": k1, "matches2": m2, "mask2": k2,
        }


def convert_dataset(record_dir: str, out_dir: str, cfg: StabNetConfig,
                    limit: int = None, shard_size: int = 64) -> int:
    """Reference TFRecords -> framework npz shards.  Returns example count."""
    examples = []
    for i, ex in enumerate(iterate_reference_examples(record_dir, cfg)):
        examples.append(ex)
        if limit is not None and i + 1 >= limit:
            break
    write_shards(out_dir, examples, shard_size=shard_size)
    return len(examples)
