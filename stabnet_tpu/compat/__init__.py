"""Reference-interop: TF checkpoint conversion, TFRecord dataset conversion."""

from stabnet_tpu.compat.tf_import import (
    convert_imagenet_checkpoint,
    convert_resnet_v2_50,
    convert_stabnet_checkpoint,
    load_tf_checkpoint,
    tensor_name_map,
)

__all__ = [
    "convert_imagenet_checkpoint",
    "convert_resnet_v2_50",
    "convert_stabnet_checkpoint",
    "load_tf_checkpoint",
    "tensor_name_map",
]
