"""TF-slim checkpoint -> Flax parameter conversion (gated on TensorFlow).

Two uses, mirroring the reference's restore paths:
  1. ImageNet `resnet_v2_50.ckpt` for transfer learning
     (train_bundle_nobm.py:184-191,208);
  2. trained StabNet checkpoints (`models/v2_93/model-80000`) for
     output-parity deployment (deploy_bundle.py:45-46).

Variable-name mapping (slim -> this framework):
  resnet_v2_50/conv1/weights                  -> resnet_v2_50/conv1/conv/kernel
  .../block{B}/unit_{U}/bottleneck_v2/preact/{gamma,beta,moving_*}
                                              -> .../block{B}_unit{U}/preact_bn/*
  .../bottleneck_v2/shortcut/{weights,biases} -> .../shortcut_conv/*
  .../bottleneck_v2/conv{1,2}/{weights}       -> .../conv{1,2}/(conv/)kernel
  .../bottleneck_v2/conv{1,2}/BatchNorm/*     -> .../bn{1,2}/*
  .../bottleneck_v2/conv3/{weights,biases}    -> .../conv3/*
  resnet_v2_50/postnorm/*                     -> postnorm/*
  stable_net/resnet/fc/fc/fc_{1,2,3}/*        -> head/fc{1,2,3}/*
  stable_net/resnet/fc/fc_weights,fc_bias     -> head/out/*

Kernel layouts: slim conv weights are (kh, kw, cin, cout) — identical to Flax
Conv; fully-connected weights are (in, out) — identical to Flax Dense.  BN
moving stats map to flax `batch_stats`.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

# Units per block for resnet_v2_50 (SURVEY.md C10).
_STAGES = (3, 4, 6, 3)


def _have_tf() -> bool:
    try:
        import tensorflow  # noqa: F401

        return True
    except ImportError:
        return False


def load_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read all variables from a TF checkpoint into numpy arrays."""
    if not _have_tf():
        raise RuntimeError(
            "TensorFlow is required to read TF checkpoints; install it or "
            "convert the checkpoint offline."
        )
    import tensorflow as tf

    reader = tf.train.load_checkpoint(path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def _bn_entry(tree_p, tree_s, flax_name: str, tf_vars: Dict[str, np.ndarray],
              tf_prefix: str) -> None:
    tree_p[flax_name] = {
        "scale": tf_vars[tf_prefix + "/gamma"],
        "bias": tf_vars[tf_prefix + "/beta"],
    }
    tree_s[flax_name] = {
        "mean": tf_vars[tf_prefix + "/moving_mean"],
        "var": tf_vars[tf_prefix + "/moving_variance"],
    }


def convert_resnet_v2_50(tf_vars: Dict[str, np.ndarray],
                         prefix: str = "resnet_v2_50"
                         ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """slim resnet_v2_50 variables -> (params, batch_stats) for `ResNetV2`.

    `prefix` is the scope inside the checkpoint (the trained StabNet model
    stores the trunk under `stable_net/resnet/resnet_v2_50`).
    """
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}

    p["conv1"] = {"conv": {
        "kernel": tf_vars[f"{prefix}/conv1/weights"],
        "bias": tf_vars[f"{prefix}/conv1/biases"],
    }}

    for b, num_units in enumerate(_STAGES, start=1):
        for u in range(1, num_units + 1):
            src = f"{prefix}/block{b}/unit_{u}/bottleneck_v2"
            dst = f"block{b}_unit{u}"
            unit_p: Dict[str, Any] = {}
            unit_s: Dict[str, Any] = {}
            _bn_entry(unit_p, unit_s, "preact_bn", tf_vars, f"{src}/preact")
            if f"{src}/shortcut/weights" in tf_vars:
                unit_p["shortcut_conv"] = {
                    "kernel": tf_vars[f"{src}/shortcut/weights"],
                    "bias": tf_vars[f"{src}/shortcut/biases"],
                }
            unit_p["conv1"] = {"kernel": tf_vars[f"{src}/conv1/weights"]}
            _bn_entry(unit_p, unit_s, "bn1", tf_vars, f"{src}/conv1/BatchNorm")
            unit_p["conv2"] = {"conv": {"kernel": tf_vars[f"{src}/conv2/weights"]}}
            _bn_entry(unit_p, unit_s, "bn2", tf_vars, f"{src}/conv2/BatchNorm")
            unit_p["conv3"] = {
                "kernel": tf_vars[f"{src}/conv3/weights"],
                "bias": tf_vars[f"{src}/conv3/biases"],
            }
            p[dst] = unit_p
            s[dst] = unit_s

    _bn_entry(p, s, "postnorm", tf_vars, f"{prefix}/postnorm")
    return p, s


def convert_stabnet_checkpoint(path: str) -> Dict[str, Any]:
    """Full trained-reference checkpoint -> flax variables for StabNetRegressor.

    Handles the reference's variable scoping (`stable_net/resnet/...`,
    s_net_bundle_nobm.py:251-259) and the head MLP + output layer.
    """
    tf_vars = load_tf_checkpoint(path)
    trunk_p, trunk_s = convert_resnet_v2_50(
        tf_vars, prefix="stable_net/resnet/resnet_v2_50"
    )

    head_p: Dict[str, Any] = {}
    fc_prefix = "stable_net/resnet/fc"
    for i in (1, 2, 3):
        head_p[f"fc{i}"] = {
            "kernel": tf_vars[f"{fc_prefix}/fc/fc_{i}/weights"],
            "bias": tf_vars[f"{fc_prefix}/fc/fc_{i}/biases"],
        }
    head_p["out"] = {
        "kernel": tf_vars[f"{fc_prefix}/fc_weights"],
        "bias": tf_vars[f"{fc_prefix}/fc_bias"],
    }

    params = {"resnet_v2_50": trunk_p, "head": head_p}
    batch_stats = {"resnet_v2_50": trunk_s}
    return {"params": _to_jnp(params), "batch_stats": _to_jnp(batch_stats)}


def convert_imagenet_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """ImageNet resnet_v2_50.ckpt -> (trunk params, trunk batch_stats)."""
    tf_vars = load_tf_checkpoint(path)
    p, s = convert_resnet_v2_50(tf_vars, prefix="resnet_v2_50")
    return _to_jnp(p), _to_jnp(s)


def _to_jnp(tree):
    import jax.numpy as jnp

    return {
        k: _to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
        for k, v in tree.items()
    }


def tensor_name_map() -> Dict[str, str]:
    """Reference deploy tensor names -> framework outputs (parity map).

    The reference deploy driver fetches tensors by graph name
    (deploy_bundle.py:48-56); this maps them to StabNet-TPU equivalents.
    """
    return {
        "stable_net/input/x_tensor:0": "stream.assemble_input(...)",
        "stable_net/inference/SpatialTransformer/_transform/output_img:0":
            "StabNetOutput.warp.output",
        "stable_net/inference/SpatialTransformer/_transform/black_pix:0":
            "StabNetOutput.warp.black_pix",
        "stable_net/inference/SpatialTransformer/_transform/get_Hs/Hs:0":
            "StabNetOutput.warp.Hs",
        "stable_net/inference/SpatialTransformer/_transform/x_map:0":
            "StabNetOutput.warp.x_map",
        "stable_net/inference/SpatialTransformer/_transform/y_map:0":
            "StabNetOutput.warp.y_map",
    }
