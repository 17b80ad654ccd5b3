"""StabNet-TPU: a TPU-native online video stabilization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
`cxjyxxme/deep-online-video-stabilization` (StabNet, IEEE TIP 2018):
ResNet-50-v2 mesh regressor, multi-grid homography warping, Siamese training
with temporal/feature/geometry losses, and an online streaming stabilizer.
"""

from stabnet_tpu.config import StabNetConfig, get_config

__version__ = "0.1.0"

__all__ = ["StabNetConfig", "get_config", "__version__"]
