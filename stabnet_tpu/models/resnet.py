"""Flax ResNet-v2-50 backbone with a 13-channel stem, slim-layout compatible.

The reference regressor is TF-slim's `resnet_v2_50` with `global_pool=False`,
`output_stride=32` (reference: s_net_bundle_nobm.py:250-259).  This is a
from-scratch Flax implementation of the same architecture, written so that a
converted slim checkpoint maps 1:1 onto the parameter tree:

  * pre-activation bottleneck units (BN+ReLU before each conv),
  * stride placed on the LAST unit of each block (slim convention, unlike
    torchvision which strides the first unit),
  * `conv2d_same` explicit padding for strided convs (TF "SAME" with stride>1
    pads asymmetrically depending on input size; slim instead pads
    (k-1)//2 / k//2 symmetrically then convolves VALID — we reproduce slim),
  * stem: 7x7/2 conv with no BN/ReLU, then 3x3/2 SAME max-pool,
  * final post-activation BN+ReLU,
  * BN epsilon 1e-5, momentum 0.997 (slim resnet_arg_scope).

Compute runs in `dtype` (bfloat16 by default — MXU native) with fp32 parameters
and fp32 BN statistics.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

BN_MOMENTUM = 0.997
BN_EPS = 1e-5


class SlimConv(nn.Module):
    """Conv with slim's `conv2d_same` padding semantics."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.stride == 1:
            padding = "SAME"
        else:
            # conv2d_same: fixed (pad_beg, pad_end) independent of input size.
            pad_total = self.kernel - 1
            pad_beg = pad_total // 2
            pad_end = pad_total - pad_beg
            padding = [(pad_beg, pad_end), (pad_beg, pad_end)]
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck unit (slim resnet_v2 `bottleneck`)."""

    depth: int             # output channels
    depth_bottleneck: int  # squeezed channels
    stride: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        depth_in = x.shape[-1]
        preact = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="preact_bn",
        )(x)
        preact = nn.relu(preact)

        if depth_in == self.depth and self.stride == 1:
            shortcut = x
        elif depth_in == self.depth:
            # slim `subsample`: 1x1 max pool with stride.
            shortcut = nn.max_pool(
                x, (1, 1), strides=(self.stride, self.stride), padding="SAME"
            )
        else:
            shortcut = nn.Conv(
                self.depth,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="shortcut_conv",
            )(preact)

        def bn(h, name):
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )(h)
            return nn.relu(h)

        residual = nn.Conv(
            self.depth_bottleneck, (1, 1), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(preact)
        residual = bn(residual, "bn1")
        residual = SlimConv(
            self.depth_bottleneck, 3, self.stride, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(residual)
        residual = bn(residual, "bn2")
        residual = nn.Conv(
            self.depth, (1, 1), use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv3",
        )(residual)
        return shortcut + residual


class ResNetV2(nn.Module):
    """slim-style resnet_v2 trunk: returns the (B, H/32, W/32, 2048) feature map."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_depths: Sequence[Tuple[int, int]] = (
        (256, 64), (512, 128), (1024, 256), (2048, 512)
    )
    # slim strides the LAST unit of blocks 1-3; block 4 is stride-1.
    stage_strides: Sequence[int] = (2, 2, 2, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # Stem: conv2d_same 7x7/2 without BN/ReLU (preact nets normalize inside
        # units), then SAME max-pool 3x3/2.
        x = SlimConv(64, 7, 2, use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for b, (num_units, (depth, depth_bn), block_stride) in enumerate(
            zip(self.stage_sizes, self.stage_depths, self.stage_strides)
        ):
            for u in range(num_units):
                stride = block_stride if u == num_units - 1 else 1
                x = BottleneckV2(
                    depth=depth,
                    depth_bottleneck=depth_bn,
                    stride=stride,
                    dtype=self.dtype,
                    name=f"block{b + 1}_unit{u + 1}",
                )(x, train=train)

        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="postnorm",
        )(x)
        return nn.relu(x)


class ThetaHead(nn.Module):
    """Mean-pool + 3-layer MLP + linear mesh-offset head.

    Reference: s_net_bundle_nobm.py:254-259 (fc 2048->1024->512, then
    `output_layer` to (grid_h+1)*(grid_w+1)*2).
    """

    theta_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        x = jnp.mean(feats, axis=(1, 2))
        for i, width in enumerate((2048, 1024, 512)):
            x = nn.Dense(width, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        # Final layer in fp32: theta magnitudes are small mesh offsets and the
        # warp path is fp32.
        x = nn.Dense(
            self.theta_dim,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            bias_init=nn.initializers.zeros,
            name="out",
        )(x.astype(jnp.float32))
        return x


class StabNetRegressor(nn.Module):
    """Backbone + head: 13-channel input stack -> mesh vertex offsets."""

    theta_dim: int = 50
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetV2(dtype=self.dtype, name="resnet_v2_50")(x, train=train)
        return ThetaHead(self.theta_dim, dtype=self.dtype, name="head")(feats)
