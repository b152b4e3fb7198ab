"""FCN head: conv3x3 + BN + ReLU + 1x1 classifier.

Reference: `/root/reference/models/decoders/fcnhead.py:9-29`. Used
standalone (FCN-32s fallback) or as the auxiliary head for
UPerNet/DeepLabV3+ (builder.py:85-97).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import torch_linear_kernel_init
from sigma_tpu.models.decoders.upernet import ConvBNReLU

Dtype = Any


class FCNHead(nn.Module):
    num_classes: int
    channels: Optional[int] = None  # default in_channels // 4
    kernel_size: int = 3
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        channels = self.channels or x.shape[-1] // 4
        x = ConvBNReLU(
            channels, kernel=self.kernel_size, dilation=self.dilation,
            dtype=self.dtype, name="conv",
        )(x, deterministic=deterministic)
        return nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=torch_linear_kernel_init(channels),
            bias_init=torch_linear_kernel_init(channels),
            dtype=self.dtype, name="classifier",
        )(x)
