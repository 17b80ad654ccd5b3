"""Training driver: the full loop with eval, checkpoints, and metrics.

Reference: train_bundle_nobm.py:199-357 — per-100-iter loss display with
data-read vs. train-time split, per-500-iter held-out eval over 10 batches,
per-5000-iter checkpoints, and the loss-gate schedule (which here lives inside
the jitted step, stabnet_tpu/train/train.py).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.models import make_model
from stabnet_tpu.parallel import data_mesh, shard_batch
from stabnet_tpu.train import checkpoint as ckpt
from stabnet_tpu.train.state import create_train_state
from stabnet_tpu.train.train import make_eval_step, make_train_step
from stabnet_tpu.utils import StageTimer, get_logger

logger = get_logger()


class MetricsWriter:
    """Scalar metrics to a JSONL file, optionally mirrored to TensorBoard.

    JSONL (`log_dir/metrics.jsonl`) is the primary machine-readable artifact;
    with `tensorboard=True` the same scalars — and the debug mosaics — are
    also written as event files under `log_dir/tb`, the reference's
    observability plane (train_bundle_nobm.py:128-153)."""

    def __init__(self, log_dir: str, tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except ImportError:
                logger.warning(
                    "tensorboard writer unavailable; scalars go to JSONL only")

    def write(self, step: int, tag: str, values: Dict[str, float]):
        import json

        self._f.write(json.dumps({"step": step, "tag": tag, **values}) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{tag}/{k}", v, step)
            # Writes are disp_freq-paced (rare), so flush eagerly: a crashed
            # run keeps its tail scalars instead of losing the buffered
            # ~2 minutes (SummaryWriter default flush cadence).
            self._tb.flush()

    def add_image(self, step: int, tag: str, image_bgr: np.ndarray):
        """Log an (H, W, 3) uint8 BGR image (no-op without TensorBoard)."""
        if self._tb is not None:
            self._tb.add_image(tag, image_bgr[..., ::-1], step,
                               dataformats="HWC")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def train(cfg: StabNetConfig,
          train_batches: Iterator,
          test_batches: Optional[Iterator] = None,
          restore: bool = False,
          num_steps: Optional[int] = None,
          use_mesh: bool = False,
          seed: int = 0,
          debug_vis: bool = False,
          imagenet_ckpt: Optional[str] = None,
          tensorboard: bool = False):
    """Run training; returns the final TrainState.

    Args:
      train_batches / test_batches: iterators of augmented batches
        (e.g. stabnet_tpu.data.InputPipeline).
      restore: resume from the latest checkpoint in cfg.model_dir
        (reference: --restore, train_bundle_nobm.py:36,204-206).
      num_steps: overrides cfg.training_iter (for smoke runs).
      use_mesh: shard the batch over all devices (data parallel).
      imagenet_ckpt: slim ImageNet resnet_v2_50 checkpoint for the cold-start
        transfer restore (reference: train_bundle_nobm.py:184-191,208 —
        applied only when NOT resuming, like the reference's if/else).
    """
    model = make_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(seed))
    if restore:
        state = ckpt.restore(cfg.model_dir, state)
    elif imagenet_ckpt:
        from stabnet_tpu.compat import convert_imagenet_checkpoint

        trunk_p, trunk_s = convert_imagenet_checkpoint(imagenet_ckpt)
        variables = ckpt.transfer_from_imagenet(
            {"params": state.params, "batch_stats": state.batch_stats},
            trunk_p, trunk_s,
        )
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        logger.info("transferred ImageNet trunk from %s (conv1 + head kept "
                    "random)", imagenet_ckpt)

    mesh = data_mesh() if use_mesh else None
    if mesh is not None:
        from stabnet_tpu.train.state import replicate_state

        # Mesh-annotate the state avals up front, or step 1 re-traces
        # (see create_train_state).
        state = replicate_state(state, mesh)
    step_fn = make_train_step(model, cfg, mesh=mesh)
    eval_fn = make_eval_step(model, cfg, mesh=mesh)
    metrics = MetricsWriter(cfg.log_dir, tensorboard=tensorboard)
    timers = StageTimer()

    def to_mesh(batch):
        if mesh is None:
            return batch
        leaves = jax.tree_util.tree_leaves(batch)
        if leaves and isinstance(leaves[0], jax.Array) and \
                getattr(leaves[0].sharding, "mesh", None) == mesh:
            return batch  # already globally sharded (MultiHostPipeline)
        return shard_batch(jax.tree_util.tree_map(np.asarray, batch), mesh)

    total = num_steps if num_steps is not None else cfg.training_iter
    start = int(state.step)
    aux = None
    try:
        for i in range(start, total):
            with timers.stage("data"):
                batch = to_mesh(next(train_batches))
            with timers.stage("step"):
                state, aux = step_fn(state, batch)

            if i % cfg.disp_freq == 0 or i == total - 1:
                vals = {k: float(v) for k, v in aux.items()}
                s = timers.summary()
                logger.info(
                    "iter %d total=%.5f img=%.5f temp=%.5f (data %.1fms step %.1fms)",
                    i, vals["total"], vals.get("img1", 0.0), vals.get("temp", 0.0),
                    s.get("data", {}).get("mean_ms", 0.0),
                    s.get("step", {}).get("mean_ms", 0.0),
                )
                metrics.write(i, "train", vals)
                timers.reset()

            if debug_vis and (i % cfg.test_freq == 0 or i == total - 1):
                # Reference equivalent: save_warpped_features dumps
                # (train_bundle_nobm.py:41-94,306,321).
                from stabnet_tpu.models import stabnet
                from stabnet_tpu.train.visualize import save_debug_batch

                variables = {"params": state.params, "batch_stats": state.batch_stats}
                out1 = stabnet.forward(
                    model, variables, batch["x1"], cfg, train=False)
                mosaics = save_debug_batch(os.path.join(cfg.log_dir, "debug"),
                                           batch, out1, cfg, i)
                if mosaics:
                    metrics.add_image(i, "debug/mosaic", mosaics[0])

            if test_batches is not None and (i % cfg.test_freq == 0 or i == total - 1):
                losses = []
                for _ in range(cfg.test_batches):
                    tb = to_mesh(next(test_batches))
                    ea = eval_fn(state, tb)
                    losses.append(float(ea["total"]))
                test_loss = float(np.mean(losses))
                logger.info("iter %d test_loss=%.5f", i, test_loss)
                metrics.write(i, "test", {"total": test_loss})

            # Always save at the final step (even step 0 of a 1-step run:
            # save/restore chains rely on every segment ending checkpointed).
            if (i > 0 and i % cfg.save_freq == 0) or i == total - 1:
                ckpt.save(cfg.model_dir, state)

    finally:
        # Flush partial metrics even when a step raises (e.g. the data
        # iterator dying mid-run) so the tail diagnostics survive.
        metrics.close()
    return state, aux
