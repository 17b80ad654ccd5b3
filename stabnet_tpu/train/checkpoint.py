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


def transfer_from_imagenet(variables: Any, trunk_params: Any,
                           trunk_stats: Any = None) -> Any:
    """Graft pretrained trunk weights, keeping the 13-ch stem + head random.

    Args:
      variables: freshly initialized StabNet variables
        ({"params": ..., "batch_stats": ...}).
      trunk_params: params for `ResNetV2` with a 3-channel stem (e.g.
        converted from the slim ImageNet checkpoint via stabnet_tpu.compat).
      trunk_stats: matching BN batch_stats.  The reference's
        `get_variables_to_restore` selects MODEL variables, which include the
        BN moving mean/variance — so the stats transfer too.

    Returns:
      variables with every trunk weight except `conv1` replaced.

    Raises:
      KeyError / ValueError on unit-name or tensor-shape mismatch (a wrong
      pretrained checkpoint must fail loudly, not train from garbage).

    Reference: train_bundle_nobm.py:101-102,184-191 (exclude conv1 + fc).
    """
    import flax

    variables = flax.core.unfreeze(variables)
    for collection, src in (("params", trunk_params),
                            ("batch_stats", trunk_stats)):
        if src is None:
            continue
        trunk = variables[collection]["resnet_v2_50"]
        # Both directions must fail loudly: extra pretrained keys mean the
        # wrong checkpoint; MISSING ones would silently leave model blocks
        # randomly initialized (a truncated/smaller-resnet checkpoint).
        missing = set(trunk) - set(src) - {"conv1"}
        if missing:
            raise KeyError(
                f"pretrained checkpoint lacks {collection} for model trunk "
                f"unit(s) {sorted(missing)}; wrong checkpoint?"
            )
        for key, value in src.items():
            if key == "conv1":
                continue  # 13-channel stem stays randomly initialized
            if key not in trunk:
                raise KeyError(
                    f"pretrained trunk has {collection}/{key!r} but the model "
                    f"does not; wrong checkpoint?"
                )
            expected = jax.tree_util.tree_map(lambda a: a.shape, trunk[key])
            got = jax.tree_util.tree_map(lambda a: a.shape, value)
            if expected != got:
                raise ValueError(
                    f"shape mismatch grafting {collection}/{key}: "
                    f"model {expected} vs pretrained {got}"
                )
            trunk[key] = value
    return variables
