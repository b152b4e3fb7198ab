"""UPerNet decode head (PPM + FPN).

Reference: `/root/reference/models/decoders/UPernet.py:8-146`. NHWC with
BatchNorm (the reference's norm_layer default); pooling scales follow
torch's AdaptiveAvgPool2d binning.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import resize_bilinear, torch_linear_kernel_init

Dtype = Any


def adaptive_avg_pool(x, out_size: int):
    """torch AdaptiveAvgPool2d semantics on NHWC."""
    b, h, w, c = x.shape
    rows = []
    for i in range(out_size):
        h0, h1 = (i * h) // out_size, -(-((i + 1) * h) // out_size)
        cols = []
        for j in range(out_size):
            w0, w1 = (j * w) // out_size, -(-((j + 1) * w) // out_size)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, s, s, C)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        fan_in = x.shape[-1] * self.kernel * self.kernel
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init(fan_in),
            bias_init=torch_linear_kernel_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            name="bn",
        )(x)
        return nn.relu(x)


class PPM(nn.Module):
    """Pooling pyramid: per scale, adaptive pool -> 1x1 conv+BN+ReLU ->
    upsample back (UPernet.py:107-146)."""

    pool_scales: Sequence[int]
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        _, h, w, _ = x.shape
        outs = []
        for k, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool(x, s)
            p = ConvBNReLU(
                self.channels, kernel=1, dtype=self.dtype, name=f"scale_{k}"
            )(p, deterministic=deterministic)
            outs.append(resize_bilinear(p, h, w))
        return outs


class UPerHead(nn.Module):
    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        # PSP on the 1/32 feature
        x = inputs[-1]
        psp_outs = [x] + PPM(
            self.pool_scales, self.channels, dtype=self.dtype, name="psp"
        )(x, deterministic=deterministic)
        psp = ConvBNReLU(self.channels, dtype=self.dtype, name="bottleneck")(
            jnp.concatenate(psp_outs, axis=-1), deterministic=deterministic
        )

        laterals = [
            ConvBNReLU(
                self.channels, kernel=1, dtype=self.dtype, name=f"lateral_{i}"
            )(inputs[i], deterministic=deterministic)
            for i in range(len(inputs) - 1)
        ] + [psp]

        for i in range(len(laterals) - 1, 0, -1):
            _, h, w, _ = laterals[i - 1].shape
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], h, w
            )

        fpn_outs = [
            ConvBNReLU(self.channels, dtype=self.dtype, name=f"fpn_{i}")(
                laterals[i], deterministic=deterministic
            )
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]

        _, h, w, _ = fpn_outs[0].shape
        fpn_outs = [fpn_outs[0]] + [
            resize_bilinear(f, h, w) for f in fpn_outs[1:]
        ]
        out = ConvBNReLU(
            self.channels, dtype=self.dtype, name="fpn_bottleneck"
        )(jnp.concatenate(fpn_outs, axis=-1), deterministic=deterministic)
        out = nn.Dropout(self.dropout_ratio)(out, deterministic=deterministic)
        return nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=torch_linear_kernel_init(self.channels),
            bias_init=torch_linear_kernel_init(self.channels),
            dtype=self.dtype, name="conv_seg",
        )(out)
