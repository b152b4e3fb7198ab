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

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sigma_tpu.models.common import (
    LN_EPS,
    resize_bilinear,
    torch_linear_kernel_init,
)
from sigma_tpu.models.vssm import (
    CVSSDecoderBlock, remat_policy, should_remat,
)

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


def _cshift(m, dr, dc):
    """Edge-clamped shift on axes 1 (rows) and 2 (cols); any rank >= 3."""
    if dr == -1:
        m = jnp.concatenate([m[:, :1], m[:, :-1]], axis=1)
    elif dr == 1:
        m = jnp.concatenate([m[:, 1:], m[:, -1:]], axis=1)
    if dc == -1:
        m = jnp.concatenate([m[:, :, :1], m[:, :, :-1]], axis=2)
    elif dc == 1:
        m = jnp.concatenate([m[:, :, 1:], m[:, :, -1:]], axis=2)
    return m


def _up2_second_moment(z):
    """Per-pixel channel mean of (up2x2(z))**2, exactly, WITHOUT building the
    upsampled tensor: (B, H, W, C) -> (B, 2H, 2W).

    An output pixel of the half-pixel 2x bilinear blends a 2x2 tap window
    with weights (.75, .25) per axis, so E_c[y^2] expands into channel-mean
    product maps of clamped-shifted z copies (13 distinct maps); each output
    phase (a, b) is a fixed linear combination of those maps and their
    shifts. Edge-clamped shifts reproduce the upsample's edge clamping
    exactly, including the degenerate corner taps."""

    def mean(a, b):
        return jnp.mean(
            a.astype(jnp.float32) * b.astype(jnp.float32), axis=-1
        )

    m0 = mean(z, z)
    zs = {
        (dr, dc): _cshift(z, dr, dc)
        for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)
    }
    mv = {sa: mean(z, zs[(sa, 0)]) for sa in (-1, 1)}
    mh = {sb: mean(z, zs[(0, sb)]) for sb in (-1, 1)}
    md = {k: mean(z, zs[k]) for k in ((-1, -1), (-1, 1), (1, -1), (1, 1))}
    ma = {
        (sa, sb): mean(zs[(sa, 0)], zs[(0, sb)])
        for sa in (-1, 1) for sb in (-1, 1)
    }
    rows = []
    for sa in (-1, 1):           # output row phase a=0 -> taps (i, i-1)
        row = []
        for sb in (-1, 1):
            e = (
                0.31640625 * m0                       # .5625^2
                + 0.03515625 * _cshift(m0, sa, 0)     # .1875^2
                + 0.03515625 * _cshift(m0, 0, sb)
                + 0.00390625 * _cshift(m0, sa, sb)    # .0625^2
                + 0.2109375 * (mv[sa] + mh[sb])       # 2*.5625*.1875
                + 0.0703125 * (md[(sa, sb)] + ma[(sa, sb)])
                + 0.0234375 * (_cshift(mh[sb], sa, 0)
                               + _cshift(mv[sa], 0, sb))  # 2*.1875*.0625
            )
            row.append(e)
        rows.append(row)
    top = jnp.stack(rows[0], axis=3)   # (B, H, W, b-phase)
    bot = jnp.stack(rows[1], axis=3)
    ph = jnp.stack([top, bot], axis=2)  # (B, H, a, W, b)
    b_, hh, _, ww, _ = ph.shape
    return ph.reshape(b_, 2 * hh, 2 * ww)


class _LNAffine(nn.Module):
    """LayerNorm affine params only (path-compatible with nn.LayerNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _OutputKernel(nn.Module):
    """Bias-free classifier kernel (path-compatible with nn.Dense)."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            torch_linear_kernel_init(self.in_dim),
            (self.in_dim, self.features),
        ).astype(jnp.float32)


class FinalUpsampleX4(nn.Module):
    """Two (linear + bilinear 2x) stages at constant C, then LN
    (MambaDecoder.py:76-97) — optionally FUSED with the 1x1 classifier.

    With `w_out`, the head returns logits directly via a statistics-carrying
    rewrite: the reference LayerNorms a C=96-channel tensor at FULL output
    resolution then projects C -> num_classes (MambaDecoder.py:217-219).
    The channel mean and the classifier projection both commute with the
    (linear) bilinear upsample, LN's affine folds into the projection
    (W' = diag(gamma) @ W_out), and E[y^2] comes from `_up2_second_moment`
    at the half resolution — so the full-resolution work collapses from 96
    channels to num_classes + 3 maps (~10x less HBM traffic at 480x640).
    The math is exact (flax LN uses the same E[x^2]-mu^2 fast variance);
    logits match the unfused path to float-reassociation error."""

    dim: int
    ln_eps: float = LN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w_out=None):
        b, h, w, _ = x.shape
        x = _dense(self.dim, self.dim, "linear1", self.dtype)(x)
        x = resize_bilinear(x, 2 * h, 2 * w)
        z = _dense(self.dim, self.dim, "linear2", self.dtype)(x)
        if w_out is None:
            y = resize_bilinear(z, 4 * h, 4 * w)
            return nn.LayerNorm(epsilon=self.ln_eps, name="norm")(y)
        gamma, beta = _LNAffine(self.dim, name="norm")()
        wp = (gamma[:, None] * w_out).astype(self.dtype)      # (C, nc)
        wbar = jnp.sum(gamma[:, None] * w_out, axis=0)        # (nc,)
        bp = beta @ w_out                                     # (nc,)
        s = resize_bilinear((z @ wp).astype(jnp.float32), 4 * h, 4 * w)
        mu_z = jnp.mean(z.astype(jnp.float32), axis=-1)       # (B,2h,2w)
        mu = resize_bilinear(mu_z[..., None], 4 * h, 4 * w)[..., 0]
        ey2 = _up2_second_moment(z)                           # (B,4h,4w)
        var = ey2 - mu * mu
        rs = jax.lax.rsqrt(var + self.ln_eps)
        logits = rs[..., None] * (s - mu[..., None] * wbar) + bp
        return logits.astype(self.dtype)


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

    remat: Any = True  # bool | int token threshold (vssm.should_remat)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        block_cls = (
            nn.remat(CVSSDecoderBlock, static_argnums=(2,),
                     policy=remat_policy())
            if should_remat(self.remat, x.shape[1] * x.shape[2])
            else CVSSDecoderBlock
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
    remat: Any = True  # bool | int token threshold (vssm.should_remat)
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
                    remat=self.remat,
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
        # 1x1 conv classifier (no bias, MambaDecoder.py:219) FUSED into the
        # final upsample head — see FinalUpsampleX4; the param tree is
        # identical to the unfused (up -> LN -> dense) form
        w_out = _OutputKernel(
            self.embed_dim, self.num_classes, name="output"
        )()
        logits = FinalUpsampleX4(
            dim=self.embed_dim, ln_eps=self.ln_eps, dtype=self.dtype, name="up"
        )(x, w_out=w_out)
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
