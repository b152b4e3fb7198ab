"""DeepLabV3+ decode head (ASPP rates 12/24/36 + low-level fuse).

Reference: `/root/reference/models/decoders/deeplabv3plus.py:6-98`. NHWC;
note the reference interpolates with align_corners=True here (unlike every
other head) — reproduced via `resize_bilinear_align_corners`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import torch_linear_kernel_init
from sigma_tpu.models.decoders.upernet import ConvBNReLU

Dtype = Any


def resize_bilinear_align_corners(x, h: int, w: int):
    """Bilinear resize with align_corners=True (corner-aligned sampling)."""
    b, ih, iw, c = x.shape

    def interp(arr, out, axis_len, axis):
        if out == axis_len:
            return arr
        if axis_len == 1:
            reps = [1, 1, 1, 1]
            reps[axis] = out
            return jnp.tile(arr, reps)
        pos = jnp.linspace(0.0, axis_len - 1.0, out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, axis_len - 2)
        wgt = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b_ = jnp.take(arr, lo + 1, axis=axis)
        shape = [1, 1, 1, 1]
        shape[axis] = out
        wgt = wgt.reshape(shape)
        return a * (1 - wgt) + b_ * wgt

    x = interp(x, h, ih, 1)
    return interp(x, w, iw, 2)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (deeplabv3plus.py:67-98)."""

    atrous_rates: Sequence[int] = (12, 24, 36)
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        _, h, w, _ = x.shape
        feats = [
            ConvBNReLU(
                self.out_channels, kernel=1, use_bias=False,
                dtype=self.dtype, name="b0",
            )(x, deterministic=deterministic)
        ]
        for k, rate in enumerate(self.atrous_rates):
            feats.append(
                ConvBNReLU(
                    self.out_channels, kernel=3, dilation=rate,
                    use_bias=False, dtype=self.dtype, name=f"b{k + 1}",
                )(x, deterministic=deterministic)
            )
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = ConvBNReLU(
            self.out_channels, kernel=1, use_bias=False, dtype=self.dtype,
            name="b4",
        )(pool, deterministic=deterministic)
        feats.append(resize_bilinear_align_corners(pool, h, w))
        x = ConvBNReLU(
            self.out_channels, kernel=1, use_bias=False, dtype=self.dtype,
            name="project",
        )(jnp.concatenate(feats, axis=-1), deterministic=deterministic)
        return nn.Dropout(0.5)(x, deterministic=deterministic)


class DeepLabV3Plus(nn.Module):
    num_classes: int
    low_channels: int = 48
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        c1, _, _, c4 = inputs
        c1 = ConvBNReLU(
            self.low_channels, dtype=self.dtype, name="low_level"
        )(c1, deterministic=deterministic)
        c4 = ASPP(dtype=self.dtype, name="aspp")(
            c4, deterministic=deterministic
        )
        _, h, w, _ = c1.shape
        c4 = resize_bilinear_align_corners(c4, h, w)
        x = ConvBNReLU(256, dtype=self.dtype, name="block_conv")(
            jnp.concatenate([c4, c1], axis=-1), deterministic=deterministic
        )
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        return nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=torch_linear_kernel_init(256),
            bias_init=torch_linear_kernel_init(256),
            dtype=self.dtype, name="classifier",
        )(x)
