"""VMamba (VSSM) backbone and its blocks, channel-last for TPU.

Reference: `/root/reference/models/encoders/vmamba.py` —
  PatchMerging2D   vmamba.py:612-636   (v1 downsample; Sigma uses v1)
  VSSBlock         vmamba.py:1673-1722
  ChannelAttention(+Block)  vmamba.py:1725-1757
  CVSSDecoderBlock vmamba.py:1760-1811
  VSSM / Backbone_VSSM      vmamba.py:1931-2212

The backbone consumes NHWC images and yields 4 NHWC pyramid features (the
reference emits NCHW; we stay channel-last end to end — TPU's native conv
layout — and the decoder consumes NHWC directly).
"""

from __future__ import annotations

import os

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sigma_tpu.models.common import (
    LN_EPS,
    DropPath,
    Mlp,
    torch_linear_kernel_init,
    trunc_normal_init,
)
from sigma_tpu.models.ss2d import SS2D

Dtype = Any


def _torch_conv_init(fan_in: int):
    return torch_linear_kernel_init(fan_in)


class PatchEmbed(nn.Module):
    """conv(patch x patch, stride patch) + LayerNorm (vmamba.py:1965-1969)."""

    embed_dim: int
    patch_size: int = 4
    ln_eps: float = LN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.patch_size * self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=True,
            kernel_init=_torch_conv_init(fan_in),
            bias_init=_torch_conv_init(fan_in),
            dtype=self.dtype,
            name="proj",
        )(x)
        return nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)


class PatchMerging2D(nn.Module):
    """v1 downsample: 2x2 space-to-channel + LN(4C) + Linear 4C->2C."""

    out_dim: int
    ln_eps: float = LN_EPS
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
        x = nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)
        x = nn.Dense(
            self.out_dim,
            use_bias=False,
            kernel_init=trunc_normal_init(0.02),
            dtype=self.dtype,
            name="reduction",
        )(x)
        return x


class VSSBlock(nn.Module):
    """x + DropPath(SS2D(LN(x))), optional FFN branch (off in Sigma)."""

    hidden_dim: int
    drop_path: float = 0.0
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    mlp_ratio: float = 0.0
    attn_drop_rate: float = 0.0
    drop_rate: float = 0.0
    ln_eps: float = LN_EPS
    linear_init: str = "trunc_normal"
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)
        y = SS2D(
            d_model=self.hidden_dim,
            d_state=self.d_state,
            ssm_ratio=self.ssm_ratio,
            dt_rank=self.dt_rank,
            dropout=self.attn_drop_rate,
            ln_eps=self.ln_eps,
            linear_init=self.linear_init,
            scan_chunk=self.scan_chunk,
            dtype=self.dtype,
            name="op",
        )(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        if self.mlp_ratio > 0:
            y = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
            y = Mlp(
                hidden_features=int(self.hidden_dim * self.mlp_ratio),
                out_features=self.hidden_dim,
                dropout=self.drop_rate,
                dtype=self.dtype,
                name="mlp",
            )(y, deterministic=deterministic)
            x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        return x


class _VSSBlockScanBody(nn.Module):
    """VSSBlock body shaped for `nn.scan`: per-step input is the block's
    drop-path rate (traced), params are stacked along the scan axis.

    Deep stages (sigma_small/base: 27 blocks) MUST scan — fully unrolled
    they emit an HLO large enough to exceed compile-request limits, and
    compile time scales with depth. Semantically identical to `VSSBlock`
    (vmamba.py:1673-1722); parameter trees differ only by the stacking.
    """

    hidden_dim: int
    deterministic: bool = True
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    mlp_ratio: float = 0.0
    ln_eps: float = LN_EPS
    linear_init: str = "trunc_normal"
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    def _drop_path(self, x, rate):
        if self.deterministic:
            return x
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        # `rate` is traced under nn.scan, so DropPath's python rate==0
        # short-circuit is impossible here; select instead so rate-0 blocks
        # stay bit-exact with the unrolled fast path (the rng draw is dead
        # work in that case but does not perturb other blocks' streams —
        # flax folds rngs by module path, not a global counter).
        return jnp.where(
            rate == 0.0, x, jnp.where(mask, x / keep, 0.0)
        ).astype(x.dtype)

    @nn.compact
    def __call__(self, x, dp):
        y = nn.LayerNorm(epsilon=self.ln_eps, name="norm")(x)
        y = SS2D(
            d_model=self.hidden_dim,
            d_state=self.d_state,
            ssm_ratio=self.ssm_ratio,
            dt_rank=self.dt_rank,
            ln_eps=self.ln_eps,
            linear_init=self.linear_init,
            scan_chunk=self.scan_chunk,
            dtype=self.dtype,
            name="op",
        )(y, deterministic=self.deterministic)
        x = x + self._drop_path(y, dp)
        if self.mlp_ratio > 0:
            y = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
            y = Mlp(
                hidden_features=int(self.hidden_dim * self.mlp_ratio),
                out_features=self.hidden_dim,
                dtype=self.dtype,
                name="mlp",
            )(y, deterministic=self.deterministic)
            x = x + self._drop_path(y, dp)
        return x, None


# Save the scan kernels' residuals across remat boundaries (pallas_scan_g
# names them 'scan_res'); everything else still rematerializes. Built to
# stop the bwd pass re-running the forward scan kernels inside every remat
# block (~12% of the train step, xprof 2026-08-20) — but MEASURED NEGATIVE
# on the v5e and therefore OFF by default: train b8 8.32 -> 8.15 img/s
# (300MB-thresholded) and b4 8.23 -> 8.19. The fwd-kernel recompute
# overlaps with the VMEM-bandwidth-bound bwd kernels, so eliminating it
# buys no wall time while the saved residuals add HBM pressure (saving
# everything at b8 overshot the 15.75G HBM budget by 176MB). Kept as an
# option for memory-rich parts / small models: SIGMA_REMAT_SAVE_SCAN=1
# (+ the SIGMA_SCAN_RES_MAX_MB per-call cap in pallas_scan_g).
_SAVE_SCAN_RES = os.environ.get("SIGMA_REMAT_SAVE_SCAN", "0") != "0"


def remat_policy():
    if _SAVE_SCAN_RES:
        return jax.checkpoint_policies.save_only_these_names("scan_res")
    return None


def should_remat(remat, tokens: int) -> bool:
    """remat policy: bool passes through; an int is a token-count
    threshold (remat only the large-L blocks)."""
    if isinstance(remat, bool):
        return remat
    return tokens >= int(remat)


def vss_stage_scan(parent_kwargs, depth, drop_paths, remat, name):
    """Build the nn.scan-stacked stage module (length = depth)."""
    body = _VSSBlockScanBody
    if remat:
        body = nn.remat(body, prevent_cse=False, policy=remat_policy())
    scanned = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=0,
        length=depth,
    )
    return scanned(**parent_kwargs, name=name), jnp.asarray(
        drop_paths, jnp.float32
    )


class ChannelAttention(nn.Module):
    """avg+max-pool SE over channels (vmamba.py:1725-1741)."""

    num_feat: int
    squeeze_factor: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        sq = max(1, self.num_feat // self.squeeze_factor)
        fc0 = nn.Dense(
            sq, use_bias=False, dtype=self.dtype,
            kernel_init=_torch_conv_init(self.num_feat), name="fc_0",
        )
        fc1 = nn.Dense(
            self.num_feat, use_bias=False, dtype=self.dtype,
            kernel_init=_torch_conv_init(sq), name="fc_1",
        )

        def fc(v):
            return fc1(nn.silu(fc0(v)))

        # avg and max paths share the same 1x1 convs (vmamba.py:1738-1739)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        attn = fc(avg) + fc(mx)
        return x * nn.sigmoid(attn)


class ChannelAttentionBlock(nn.Module):
    """CAB: conv3x3 compress + GELU + conv3x3 + ChannelAttention
    (vmamba.py:1744-1757). NHWC."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = max(1, self.num_feat // self.compress_ratio)
        x = nn.Conv(
            mid, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=_torch_conv_init(self.num_feat * 9),
            bias_init=_torch_conv_init(self.num_feat * 9),
            name="conv1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.num_feat, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=_torch_conv_init(mid * 9),
            bias_init=_torch_conv_init(mid * 9),
            name="conv2",
        )(x)
        return ChannelAttention(
            self.num_feat, self.squeeze_factor, dtype=self.dtype, name="attn"
        )(x)


class CVSSDecoderBlock(nn.Module):
    """Channel-aware VSS decoder block (vmamba.py:1760-1811).

    x*scale1 + DropPath(SS2D(LN1(x))), then CAB(LN2(x)) + x*scale2.
    """

    hidden_dim: int
    drop_path: float = 0.0
    d_state: int = 4
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        scale1 = self.param(
            "scale1", nn.initializers.ones, (self.hidden_dim,)
        )
        scale2 = self.param(
            "scale2", nn.initializers.ones, (self.hidden_dim,)
        )
        y = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        y = SS2D(
            d_model=self.hidden_dim,
            d_state=self.d_state,
            ssm_ratio=self.ssm_ratio,
            dt_rank=self.dt_rank,
            ln_eps=self.ln_eps,
            linear_init="torch",
            scan_chunk=self.scan_chunk,
            dtype=self.dtype,
            name="op",
        )(y, deterministic=deterministic)
        x = x * scale1 + DropPath(self.drop_path)(
            y, deterministic=deterministic
        )
        y = ChannelAttentionBlock(
            self.hidden_dim, dtype=self.dtype, name="conv_blk"
        )(nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x))
        return y + x * scale2


class VSSMBackbone(nn.Module):
    """Segmentation VSSM trunk: patch embed + 4 stages of VSSBlocks with v1
    patch-merging downsamples; per-stage `outnorm` LayerNorms; returns the 4
    pre-downsample pyramid features (Backbone_VSSM, vmamba.py:2151-2212).

    `remat=True` rematerializes each block in the backward pass (the
    reference's optional `use_checkpoint`, vmamba.py:1718-1722) — without it
    the ~35 scan calls' saved residuals blow past HBM at training batch
    sizes.
    """

    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    mlp_ratio: float = 0.0
    drop_path_rate: float = 0.2
    patch_size: int = 4
    ln_eps: float = LN_EPS
    out_indices: Sequence[int] = (0, 1, 2, 3)
    scan_chunk: int = 128
    # True: remat every block; False: never; int: remat only blocks whose
    # token count H*W is >= the threshold (selective remat — the stride-4
    # stages dominate both residual memory and recompute cost)
    remat: Union[bool, int] = True
    # stages at least this deep run under nn.scan with stacked params —
    # sigma_small/base's 27-block stage 3 fully unrolled exceeds
    # compile-request size limits and compiles O(depth) slower
    scan_min_depth: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dims = list(self.dims)
        depths = list(self.depths)
        total = sum(depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)

        x = PatchEmbed(
            embed_dim=dims[0],
            patch_size=self.patch_size,
            ln_eps=self.ln_eps,
            dtype=self.dtype,
            name="patch_embed",
        )(x)

        outs = []
        blk_idx = 0
        for i, depth in enumerate(depths):
            stage_remat = should_remat(self.remat, x.shape[1] * x.shape[2])
            block_cls = (
                nn.remat(VSSBlock, static_argnums=(2,), policy=remat_policy())
                if stage_remat else VSSBlock
            )
            if depth >= self.scan_min_depth:
                stage, dps = vss_stage_scan(
                    dict(
                        hidden_dim=dims[i],
                        deterministic=deterministic,
                        d_state=self.d_state,
                        ssm_ratio=self.ssm_ratio,
                        dt_rank=self.dt_rank,
                        mlp_ratio=self.mlp_ratio,
                        ln_eps=self.ln_eps,
                        scan_chunk=self.scan_chunk,
                        dtype=self.dtype,
                    ),
                    depth,
                    dpr[blk_idx : blk_idx + depth],
                    stage_remat,
                    name=f"layers_{i}_scan",
                )
                x, _ = stage(x, dps)
                blk_idx += depth
            else:
                for d in range(depth):
                    x = block_cls(
                        hidden_dim=dims[i],
                        drop_path=float(dpr[blk_idx]),
                        d_state=self.d_state,
                        ssm_ratio=self.ssm_ratio,
                        dt_rank=self.dt_rank,
                        mlp_ratio=self.mlp_ratio,
                        ln_eps=self.ln_eps,
                        scan_chunk=self.scan_chunk,
                        dtype=self.dtype,
                        name=f"layers_{i}_blocks_{d}",
                    )(x, deterministic)
                    blk_idx += 1
            if i in self.out_indices:
                o = nn.LayerNorm(epsilon=self.ln_eps, name=f"outnorm{i}")(x)
                outs.append(o)
            if i < len(depths) - 1:
                x = PatchMerging2D(
                    out_dim=dims[i + 1],
                    ln_eps=self.ln_eps,
                    dtype=self.dtype,
                    name=f"layers_{i}_downsample",
                )(x)
        return outs


class VSSMClassifier(nn.Module):
    """Full VSSM image classifier (reference `VSSM`, vmamba.py:1931-2147).

    Sigma itself only uses the segmentation trunk (`VSSMBackbone`), but the
    reference tree ships the complete classifier backbone whose ImageNet
    checkpoints seed the trunk; this is the parity-complete variant:
    patch embed -> 4 VSSBlock stages with v1 PatchMerging2D downsamples ->
    LayerNorm -> global average pool -> linear head (vmamba.py:2006-2012).
    """

    num_classes: int = 1000
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    mlp_ratio: float = 0.0
    drop_path_rate: float = 0.2
    patch_size: int = 4
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    remat: bool = False
    scan_min_depth: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dims = list(self.dims)
        depths = list(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(depths))
        block_cls = (
            nn.remat(VSSBlock, static_argnums=(2,), policy=remat_policy())
            if self.remat else VSSBlock
        )

        x = PatchEmbed(
            embed_dim=dims[0],
            patch_size=self.patch_size,
            ln_eps=self.ln_eps,
            dtype=self.dtype,
            name="patch_embed",
        )(x)

        blk_idx = 0
        for i, depth in enumerate(depths):
            if depth >= self.scan_min_depth:
                stage, dps = vss_stage_scan(
                    dict(
                        hidden_dim=dims[i],
                        deterministic=deterministic,
                        d_state=self.d_state,
                        ssm_ratio=self.ssm_ratio,
                        dt_rank=self.dt_rank,
                        mlp_ratio=self.mlp_ratio,
                        ln_eps=self.ln_eps,
                        scan_chunk=self.scan_chunk,
                        dtype=self.dtype,
                    ),
                    depth,
                    dpr[blk_idx : blk_idx + depth],
                    self.remat,
                    name=f"layers_{i}_scan",
                )
                x, _ = stage(x, dps)
                blk_idx += depth
            else:
                for d in range(depth):
                    x = block_cls(
                        hidden_dim=dims[i],
                        drop_path=float(dpr[blk_idx]),
                        d_state=self.d_state,
                        ssm_ratio=self.ssm_ratio,
                        dt_rank=self.dt_rank,
                        mlp_ratio=self.mlp_ratio,
                        ln_eps=self.ln_eps,
                        scan_chunk=self.scan_chunk,
                        dtype=self.dtype,
                        name=f"layers_{i}_blocks_{d}",
                    )(x, deterministic)
                    blk_idx += 1
            if i < len(depths) - 1:
                x = PatchMerging2D(
                    out_dim=dims[i + 1],
                    ln_eps=self.ln_eps,
                    dtype=self.dtype,
                    name=f"layers_{i}_downsample",
                )(x)

        x = nn.LayerNorm(epsilon=self.ln_eps, name="classifier_norm")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool (B, C)
        return nn.Dense(
            self.num_classes,
            kernel_init=trunc_normal_init(0.02),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="classifier_head",
        )(x)
