"""Model zoo: Flax ResNet-v2-50 regressor + StabNet forward."""

from stabnet_tpu.models.resnet import ResNetV2, StabNetRegressor, ThetaHead
from stabnet_tpu.models.stabnet import (
    StabNetOutput,
    current_frame,
    forward,
    init_variables,
    make_model,
    scale_theta_head,
)

__all__ = [
    "ResNetV2",
    "StabNetOutput",
    "StabNetRegressor",
    "ThetaHead",
    "current_frame",
    "forward",
    "init_variables",
    "make_model",
    "scale_theta_head",
]
