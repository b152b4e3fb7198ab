"""Mamba (CVSS) UNet-style decoder.

Reference: `/root/reference/models/decoders/MambaDecoder.py` —
  PatchExpand        MambaDecoder.py:12-30   (linear 2x expand + pixel shuffle)
  UpsampleExpand     MambaDecoder.py:33-51   (linear C/2 + bilinear 2x)
  FinalUpsample_X4   MambaDecoder.py:76-97
  Mamba_up           MambaDecoder.py:101-148 (CVSSDecoderBlock stack)
  MambaDecoder       MambaDecoder.py:151-280

Channel-last throughout; skip features arrive as NHWC pyramid [1/4 .. 1/32].
Odd-size skips (PST900) are handled by bilinear-resizing the upsampled path
to the skip's spatial shape before adding (MambaDecoder.py:230-234).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sigma_tpu.models.common import (
    LN_EPS,
    resize_bilinear,
    torch_linear_kernel_init,
)
from sigma_tpu.models.vssm import CVSSDecoderBlock

Dtype = Any


def _dense(features, fan_in, name, dtype, use_bias=False):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_linear_kernel_init(fan_in),
        bias_init=torch_linear_kernel_init(fan_in),
        dtype=dtype,
        name=name,
    )


class PatchExpand(nn.Module):
    """Linear C->2C then 2x2 pixel shuffle: (B,H,W,C) -> (B,2H,2W,C/2)."""

    dim: int
    ln_eps: float = LN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _dense(2 * self.dim, self.dim, "expand", self.dtype)(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, 2, 2, c // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 4)
        return nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)


class UpsampleExpand(nn.Module):
    """Linear C->C/2 then bilinear 2x: (B,H,W,C) -> (B,2H,2W,C/2)."""

    dim: int
    ln_eps: float = LN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        x = _dense(self.dim // 2, self.dim, "linear", self.dtype)(x)
        x = resize_bilinear(x, 2 * h, 2 * w)
        return nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)


class FinalUpsampleX4(nn.Module):
    """Two (linear + bilinear 2x) stages at constant C, then LN."""

    dim: int
    ln_eps: float = LN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        x = _dense(self.dim, self.dim, "linear1", self.dtype)(x)
        x = resize_bilinear(x, 2 * h, 2 * w)
        x = _dense(self.dim, self.dim, "linear2", self.dtype)(x)
        x = resize_bilinear(x, 4 * h, 4 * w)
        return nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)


class MambaUp(nn.Module):
    """Stack of CVSSDecoderBlocks + optional UpsampleExpand."""

    dim: int
    depth: int
    drop_path: Sequence[float]
    d_state: int = 4
    ssm_ratio: float = 2.0
    upsample: bool = True
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    remat: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        block_cls = (
            nn.remat(CVSSDecoderBlock, static_argnums=(2,))
            if self.remat else CVSSDecoderBlock
        )
        for i in range(self.depth):
            x = block_cls(
                hidden_dim=self.dim,
                drop_path=float(self.drop_path[i]),
                d_state=self.d_state,
                ssm_ratio=self.ssm_ratio,
                ln_eps=self.ln_eps,
                scan_chunk=self.scan_chunk,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        if self.upsample:
            x = UpsampleExpand(
                dim=self.dim, ln_eps=self.ln_eps, dtype=self.dtype,
                name="upsample",
            )(x)
        return x


class MambaDecoder(nn.Module):
    """4-level UNet-style decoder over the fused pyramid.

    inputs: list of 4 NHWC features at strides [4, 8, 16, 32] with channels
    [C, 2C, 4C, 8C]; returns logits at stride 1 (4x the stride-4 map).
    """

    num_classes: int
    embed_dim: int = 96
    depths: Sequence[int] = (4, 4, 4, 4)
    d_state: int = 4
    ssm_ratio: float = 2.0
    drop_path_rate: float = 0.1
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    deep_supervision: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        depths = list(self.depths)
        n = len(depths)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(depths))

        y = None
        ds_feats = []  # deep-supervision taps (MambaDecoder.py:240-257)
        for i in range(n):
            lvl = n - 1 - i  # pyramid level consumed at this layer
            dim = int(self.embed_dim * 2**lvl)
            if i == 0:
                y = PatchExpand(
                    dim=dim, ln_eps=self.ln_eps, dtype=self.dtype,
                    name="layers_up_0",
                )(inputs[lvl])
                if self.deep_supervision:
                    ds_feats.append(
                        nn.LayerNorm(epsilon=self.ln_eps, name="norm_ds_0")(y)
                    )
            else:
                skip = inputs[lvl]
                _, h, w, _ = skip.shape
                if y.shape[1:3] != (h, w):  # odd sizes (PST900)
                    y = resize_bilinear(y, h, w)
                x = y + skip
                y = MambaUp(
                    dim=dim,
                    depth=depths[lvl],
                    drop_path=dpr[sum(depths[:lvl]) : sum(depths[: lvl + 1])],
                    d_state=self.d_state,
                    ssm_ratio=self.ssm_ratio,
                    upsample=(i < n - 1),
                    ln_eps=self.ln_eps,
                    scan_chunk=self.scan_chunk,
                    dtype=self.dtype,
                    name=f"layers_up_{i}",
                )(x, deterministic=deterministic)
                if self.deep_supervision and i != n - 1:
                    ds_feats.append(
                        nn.LayerNorm(
                            epsilon=self.ln_eps, name=f"norm_ds_{i}"
                        )(y)
                    )

        x = nn.LayerNorm(epsilon=self.ln_eps, name="norm_up")(y)
        x = FinalUpsampleX4(
            dim=self.embed_dim, ln_eps=self.ln_eps, dtype=self.dtype, name="up"
        )(x)
        # 1x1 conv classifier, no bias (MambaDecoder.py:219)
        logits = _dense(
            self.num_classes, self.embed_dim, "output", self.dtype
        )(x)
        if not self.deep_supervision:
            return logits

        # aux heads: bilinear x16/x8/x4 then biasless 1x1 conv
        # (MambaDecoder.py:210-212, 266-270)
        aux = []
        for idx, (feat, scale) in enumerate(zip(ds_feats, (16, 8, 4))):
            b, h, w, c = feat.shape
            up = resize_bilinear(feat, h * scale, w * scale)
            aux.append(
                _dense(self.num_classes, c, f"output_ds_{idx}", self.dtype)(up)
            )
        return logits, aux
