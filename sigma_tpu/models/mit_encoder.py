"""Dual SegFormer (MiT) RGB-X encoder with FRM/FFM fusion.

Reference: `/root/reference/models/encoders/dual_segformer.py` — two
separate MiT trunks (RGB + modal-X), per-stage FeatureRectifyModule applied
to the stage outputs and FeatureFusionModule producing the fused pyramid
feature (dual_segformer.py:355-436); variants mit_b0..b5
(dual_segformer.py:476-521). Channel-last NHWC.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sigma_tpu.models.common import DropPath, trunc_normal_init
from sigma_tpu.models.net_utils import (
    FeatureFusionModule,
    FeatureRectifyModule,
)

Dtype = Any


def _conv_init(fan_out: int):
    return nn.initializers.normal(stddev=math.sqrt(2.0 / fan_out))


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv patch embed + LN (dual_segformer.py:180-222).
    NHWC in, NHWC out."""

    embed_dim: int
    patch_size: int = 7
    stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(self.stride, self.stride),
            padding=[(p // 2, p // 2), (p // 2, p // 2)],
            kernel_init=_conv_init(p * p * self.embed_dim),
            dtype=self.dtype, name="proj",
        )(x)
        # MiT uses LayerNorm eps=1e-6 (dual_segformer.py:480)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class MixFFN(nn.Module):
    """MLP with a 3x3 depthwise conv between fc1 and GELU
    (dual_segformer.py:16-71). NHWC."""

    hidden: int
    out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc1")(x)
        x = nn.Conv(self.hidden, (3, 3), padding="SAME",
                    feature_group_count=self.hidden,
                    kernel_init=_conv_init(9), dtype=self.dtype,
                    name="dwconv")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class SRAttention(nn.Module):
    """Spatial-reduction attention (dual_segformer.py:74-135). NHWC."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5
        l = h * w

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="q")(x)
        q = q.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio
            kv_in = nn.Conv(c, (r, r), strides=(r, r),
                            kernel_init=_conv_init(r * r * c),
                            dtype=self.dtype, name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(kv_in)
        lk = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      kernel_init=trunc_normal_init(), name="kv")(kv_in)
        kv = kv.reshape(b, lk, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bhld,bhmd->bhlm", q, k) * scale
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        y = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        y = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                     name="proj")(y)
        return nn.Dropout(self.proj_drop)(y, deterministic=deterministic)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    drop_path: float = 0.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                        proj_drop=self.dropout, dtype=self.dtype,
                        name="attn")(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MixFFN(int(self.dim * self.mlp_ratio), self.dim, self.dropout,
                   dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic
        )
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class MiTTrunk(nn.Module):
    """One MiT pyramid trunk; returns the 4 stage outputs."""

    embed_dims: Sequence[int]
    depths: Sequence[int]
    num_heads: Sequence[int]
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    drop_path_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        cur = 0
        for i in range(4):
            x = OverlapPatchEmbed(
                self.embed_dims[i],
                patch_size=7 if i == 0 else 3,
                stride=4 if i == 0 else 2,
                dtype=self.dtype,
                name=f"patch_embed{i + 1}",
            )(x)
            for j in range(self.depths[i]):
                x = MiTBlock(
                    self.embed_dims[i], self.num_heads[i],
                    self.mlp_ratios[i], self.sr_ratios[i],
                    drop_path=float(dpr[cur + j]), dtype=self.dtype,
                    name=f"block{i + 1}_{j}",
                )(x, deterministic=deterministic)
            cur += self.depths[i]
            x = nn.LayerNorm(epsilon=1e-6, name=f"norm{i + 1}")(x)
            outs.append(x)
        return outs


class DualMiTEncoder(nn.Module):
    """Two MiT trunks + per-stage FRM/FFM fusion."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    drop_path_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_rgb, x_e, deterministic: bool = True):
        kw = dict(
            embed_dims=self.embed_dims, depths=self.depths,
            num_heads=self.num_heads, sr_ratios=self.sr_ratios,
            drop_path_rate=self.drop_path_rate, dtype=self.dtype,
        )
        outs_rgb = MiTTrunk(**kw, name="trunk")(
            x_rgb, deterministic=deterministic
        )
        outs_e = MiTTrunk(**kw, name="extra_trunk")(
            x_e, deterministic=deterministic
        )
        fused = []
        for i in range(4):
            r, e = FeatureRectifyModule(
                self.embed_dims[i], dtype=self.dtype, name=f"frm_{i}"
            )(outs_rgb[i], outs_e[i])
            fused.append(
                FeatureFusionModule(
                    self.embed_dims[i], num_heads=self.num_heads[i],
                    dtype=self.dtype, name=f"ffm_{i}",
                )(r, e, deterministic=deterministic)
            )
        return fused


# variants (dual_segformer.py:476-521)
MIT_VARIANTS = {
    "mit_b0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "mit_b2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "mit_b3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "mit_b4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "mit_b5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3)),
}
