"""Dual Swin-Transformer RGB-X encoder with FRM/FFM fusion.

Reference: `/root/reference/models/encoders/dual_swin.py` — two Swin trunks
(RGB + modal-X); per stage the trunk outputs pass through a
FeatureRectifyModule BEFORE downsampling, and each out-index emits
norm + FeatureFusionModule fused features (dual_swin.py:625-680).
Variants swin_s (embed 96, window 7) / swin_b (embed 128, window 12)
(dual_swin.py:686-696). Channel-last NHWC; shifted-window attention with
relative position bias, cyclic shifts via jnp.roll and additive masks.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sigma_tpu.models.common import (
    LN_EPS,
    DropPath,
    Mlp,
    trunc_normal_init,
)
from sigma_tpu.models.net_utils import (
    FeatureFusionModule,
    FeatureRectifyModule,
)

Dtype = Any


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, b: int, h: int, w: int):
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Additive mask (nW, ws*ws, ws*ws) for shifted windows
    (dual_swin.py BasicLayer mask construction)."""
    img = np.zeros((hp, wp), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = (
        img.reshape(hp // ws, ws, wp // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        # x: (B*nW, N, C); mask: (nW, N, N) or None
        bnw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = hd**-0.5
        ws = self.window_size

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h),
        )
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bnw, h, n, n)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        y = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                     name="proj")(y)
        return nn.Dropout(self.proj_drop)(y, deterministic=deterministic)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.window_size
        # small maps: keep the full window (pad up) and drop the shift,
        # like the reference (dual_swin.py pads to window multiples and the
        # bias table stays window-sized regardless of resolution)
        shift = self.shift_size if min(h, w) > ws else 0
        ws_eff = ws

        shortcut = x
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)

        pad_b = (ws_eff - h % ws_eff) % ws_eff
        pad_r = (ws_eff - w % ws_eff) % ws_eff
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws_eff, shift))
        else:
            mask = None

        windows = window_partition(x, ws_eff)
        attn_out = WindowAttention(
            self.dim, self.num_heads, ws_eff, attn_drop=self.attn_drop,
            proj_drop=self.drop, dtype=self.dtype, name="attn",
        )(windows, mask, deterministic=deterministic)
        x = window_reverse(attn_out, ws_eff, b, hp, wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]

        x = shortcut + DropPath(self.drop_path)(
            x, deterministic=deterministic
        )
        y = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, self.drop, dtype=self.dtype,
                name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class SwinPatchMerging(nn.Module):
    """2x2 space-to-channel + LN(4C) + Linear 4C->2C (dual_swin.py:258-297;
    pads odd sizes)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        kernel_init=trunc_normal_init(),
                        name="reduction")(x)


class SwinTrunk(nn.Module):
    """One Swin pyramid trunk; yields pre-downsample stage features."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    attn_drop_rate: float = 0.3
    patch_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.patch_size
        b, h, w, _ = x.shape
        if h % p or w % p:
            x = jnp.pad(x, ((0, 0), (0, (-h) % p), (0, (-w) % p), (0, 0)))
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    kernel_init=trunc_normal_init(), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        cur = 0
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[cur + j]),
                    attn_drop=self.attn_drop_rate,
                    dtype=self.dtype, name=f"layers_{i}_blocks_{j}",
                )(x, deterministic=deterministic)
            cur += depth
            outs.append(x)
            if i < len(self.depths) - 1:
                x = SwinPatchMerging(dim, dtype=self.dtype,
                                     name=f"layers_{i}_downsample")(x)
                dim *= 2
        return outs


class DualSwinEncoder(nn.Module):
    """Two interleaved Swin trunks with per-stage FRM + FFM.

    Per stage (dual_swin.py:644-680): both modalities run their blocks,
    FRM rectifies BOTH (and the rectified features feed the next stage's
    downsample), then per-stage norms + FFM emit the fused output.
    """

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    attn_drop_rate: float = 0.3
    patch_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_rgb, x_e, deterministic: bool = True):
        p = self.patch_size

        def embed(x, suffix):
            b, h, w, _ = x.shape
            if h % p or w % p:
                x = jnp.pad(
                    x, ((0, 0), (0, (-h) % p), (0, (-w) % p), (0, 0))
                )
            x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                        kernel_init=trunc_normal_init(), dtype=self.dtype,
                        name=f"patch_embed{suffix}")(x)
            return nn.LayerNorm(epsilon=LN_EPS, name=f"patch_norm{suffix}")(x)

        x = embed(x_rgb, "")
        xd = embed(x_e, "_d")

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        cur = 0
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                kw = dict(
                    dim=dim, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[cur + j]),
                    attn_drop=self.attn_drop_rate, dtype=self.dtype,
                )
                x = SwinBlock(**kw, name=f"layers_{i}_blocks_{j}")(
                    x, deterministic=deterministic
                )
                xd = SwinBlock(**kw, name=f"layers_d_{i}_blocks_{j}")(
                    xd, deterministic=deterministic
                )
            cur += depth

            # rectify — feeds both the output heads and the next stage
            x, xd = FeatureRectifyModule(dim, dtype=self.dtype,
                                         name=f"frm_{i}")(x, xd)

            r = nn.LayerNorm(epsilon=LN_EPS, name=f"norm{i}")(x)
            e = nn.LayerNorm(epsilon=LN_EPS, name=f"norm_d{i}")(xd)
            outs.append(
                FeatureFusionModule(
                    dim, num_heads=self.num_heads[i], dtype=self.dtype,
                    name=f"ffm_{i}",
                )(r, e, deterministic=deterministic)
            )

            if i < len(self.depths) - 1:
                x = SwinPatchMerging(dim, dtype=self.dtype,
                                     name=f"layers_{i}_downsample")(x)
                xd = SwinPatchMerging(dim, dtype=self.dtype,
                                      name=f"layers_d_{i}_downsample")(xd)
                dim *= 2
        return outs


SWIN_VARIANTS = {
    "swin_s": dict(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
        window_size=7,
    ),
    "swin_b": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_size=12,
    ),
}
