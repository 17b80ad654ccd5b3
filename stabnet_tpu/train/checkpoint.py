"""Orbax checkpointing + transfer-learning restore.

Reference equivalents:
  * periodic full checkpoints + restore-latest (`tf.train.Saver`,
    train_bundle_nobm.py:195,204-208,271-272),
  * cold-start transfer restore of an ImageNet ResNet-v2-50 excluding the
    13-channel conv1 and the fc head (train_bundle_nobm.py:101-102,184-191).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from stabnet_tpu.train.state import TrainState
from stabnet_tpu.utils import get_logger

logger = get_logger()


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
    )


def save(directory: str, state: TrainState, step: Optional[int] = None) -> None:
    mgr = _manager(directory)
    step = int(state.step) if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    logger.info("saved checkpoint step=%d to %s", step, directory)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    return mgr.latest_step()


def restore(directory: str, target: TrainState) -> TrainState:
    """Restore the latest checkpoint into the structure of `target`."""
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    logger.info("restored checkpoint step=%d from %s", step, directory)
    return restored


def transfer_from_imagenet(params: Any, pretrained_trunk: Any) -> Any:
    """Graft pretrained trunk weights, keeping the 13-ch stem + head random.

    Args:
      params: freshly initialized StabNet params (flax dict).
      pretrained_trunk: params for `ResNetV2` with a 3-channel stem (e.g.
        converted from the slim ImageNet checkpoint via stabnet_tpu.compat).

    Returns:
      params with every trunk weight except `conv1` replaced.

    Reference: train_bundle_nobm.py:184-191 (exclude conv1 + fc).
    """
    import flax

    params = flax.core.unfreeze(params)
    trunk = params["resnet_v2_50"]
    src = pretrained_trunk
    for key, value in src.items():
        if key == "conv1":
            continue  # 13-channel stem stays randomly initialized
        if key in trunk:
            trunk[key] = value
    shapes_ok = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape, trunk, params["resnet_v2_50"]
        )
    )
    assert shapes_ok
    return params
