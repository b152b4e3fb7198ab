"""CMX-style fusion modules (FRM / FFM) for the non-Mamba dual backbones.

Reference: `/root/reference/models/net_utils.py` —
  ChannelWeights / SpatialWeights / FeatureRectifyModule  (:9-77)
  CrossAttention (linear cross attention) / CrossPath     (:81-132)
  ChannelEmbed / FeatureFusionModule                      (:136-188)

Channel-last (B, H, W, C) throughout.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import LN_EPS, trunc_normal_init

Dtype = Any


def _conv_init(fan_out: int):
    # reference conv init: normal(0, sqrt(2/fan_out)) (net_utils.py:65-70)
    return nn.initializers.normal(stddev=math.sqrt(2.0 / fan_out))


class ChannelWeights(nn.Module):
    dim: int
    reduction: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        b = x1.shape[0]
        x = jnp.concatenate([x1, x2], axis=-1)  # (B, H, W, 2C)
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        y = jnp.concatenate([avg, mx], axis=-1)  # (B, 4C)
        y = nn.Dense(4 * self.dim // self.reduction, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(2 * self.dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc2")(y)
        y = nn.sigmoid(y).reshape(b, 2, 1, 1, self.dim)
        return y[:, 0], y[:, 1]  # (B,1,1,C) each


class SpatialWeights(nn.Module):
    dim: int
    reduction: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        x = jnp.concatenate([x1, x2], axis=-1)
        y = nn.Conv(self.dim // self.reduction, (1, 1), dtype=self.dtype,
                    kernel_init=_conv_init(self.dim // self.reduction),
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(2, (1, 1), dtype=self.dtype, kernel_init=_conv_init(2),
                    name="conv2")(y)
        y = nn.sigmoid(y)  # (B, H, W, 2)
        return y[..., 0:1], y[..., 1:2]


class FeatureRectifyModule(nn.Module):
    """FRM: exchange channel- and spatial-gated residuals between
    modalities (net_utils.py:49-77)."""

    dim: int
    reduction: int = 1
    lambda_c: float = 0.5
    lambda_s: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        cw0, cw1 = ChannelWeights(self.dim, self.reduction, self.dtype,
                                  name="channel_weights")(x1, x2)
        sw0, sw1 = SpatialWeights(self.dim, self.reduction, self.dtype,
                                  name="spatial_weights")(x1, x2)
        out1 = x1 + self.lambda_c * cw1 * x2 + self.lambda_s * sw1 * x2
        out2 = x2 + self.lambda_c * cw0 * x1 + self.lambda_s * sw0 * x1
        return out1, out2


class CrossAttention(nn.Module):
    """Linear cross attention: per modality a context (C/h x C/h) matrix
    k^T v is softmaxed and queried by the OTHER modality
    (net_utils.py:81-108). Inputs (B, L, C)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        b, l, c = x1.shape
        h = self.num_heads
        hd = c // h
        scale = hd**-0.5

        def heads(t):
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        q1, q2 = heads(x1), heads(x2)
        kv1 = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="kv1")(x1)
        kv2 = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="kv2")(x2)
        k1, v1 = heads(kv1[..., :c]), heads(kv1[..., c:])
        k2, v2 = heads(kv2[..., :c]), heads(kv2[..., c:])

        def ctx(k, v):
            m = jnp.einsum("bhld,bhle->bhde", k, v) * scale
            return nn.softmax(m, axis=-2)

        y1 = jnp.einsum("bhld,bhde->bhle", q1, ctx(k2, v2))
        y2 = jnp.einsum("bhld,bhde->bhle", q2, ctx(k1, v1))
        y1 = y1.transpose(0, 2, 1, 3).reshape(b, l, c)
        y2 = y2.transpose(0, 2, 1, 3).reshape(b, l, c)
        return y1, y2


class CrossPath(nn.Module):
    dim: int
    reduction: int = 1
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        half = self.dim // self.reduction
        p1 = nn.relu(
            nn.Dense(2 * half, dtype=self.dtype,
                     kernel_init=trunc_normal_init(),
                     name="channel_proj1")(x1)
        )
        p2 = nn.relu(
            nn.Dense(2 * half, dtype=self.dtype,
                     kernel_init=trunc_normal_init(),
                     name="channel_proj2")(x2)
        )
        y1, u1 = p1[..., :half], p1[..., half:]
        y2, u2 = p2[..., :half], p2[..., half:]
        v1, v2 = CrossAttention(half, self.num_heads, dtype=self.dtype,
                                name="cross_attn")(u1, u2)
        out1 = nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init(),
                        name="end_proj1")(jnp.concatenate([y1, v1], -1))
        out2 = nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init(),
                        name="end_proj2")(jnp.concatenate([y2, v2], -1))
        out1 = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x1 + out1)
        out2 = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x2 + out2)
        return out1, out2


class ChannelEmbed(nn.Module):
    out_channels: int
    reduction: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mid = self.out_channels // self.reduction
        residual = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                           dtype=self.dtype,
                           kernel_init=_conv_init(self.out_channels),
                           name="residual")(x)
        y = nn.Conv(mid, (1, 1), dtype=self.dtype, kernel_init=_conv_init(mid),
                    name="embed1")(x)
        y = nn.Conv(mid, (3, 3), padding="SAME", feature_group_count=mid,
                    dtype=self.dtype, kernel_init=_conv_init(9),
                    name="embed_dw")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=_conv_init(self.out_channels),
                    name="embed2")(y)
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="embed_bn")(y)
        out = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                           epsilon=1e-5, name="norm")(residual + y)
        return out


class FeatureFusionModule(nn.Module):
    """FFM: cross linear-attention exchange then channel embedding of the
    concatenated modalities (net_utils.py:159-188)."""

    dim: int
    reduction: int = 1
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        b, h, w, c = x1.shape
        s1 = x1.reshape(b, h * w, c)
        s2 = x2.reshape(b, h * w, c)
        s1, s2 = CrossPath(c, self.reduction, self.num_heads,
                           dtype=self.dtype, name="cross")(s1, s2)
        merge = jnp.concatenate([s1, s2], axis=-1).reshape(b, h, w, 2 * c)
        return ChannelEmbed(c, self.reduction, dtype=self.dtype,
                            name="channel_emb")(
            merge, deterministic=deterministic
        )
