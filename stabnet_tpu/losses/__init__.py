"""StabNet training losses."""

from stabnet_tpu.losses.losses import (
    black_pos_loss,
    consistency_loss,
    distortion_loss,
    feature_loss,
    id_loss,
    img_loss,
    l2_regularization,
    masked_mse,
    temporal_loss,
    total_loss,
    warp_pts,
)

__all__ = [
    "black_pos_loss",
    "consistency_loss",
    "distortion_loss",
    "feature_loss",
    "id_loss",
    "img_loss",
    "l2_regularization",
    "masked_mse",
    "temporal_loss",
    "total_loss",
    "warp_pts",
]
