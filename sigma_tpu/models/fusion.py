"""Cross-modal fusion blocks (CroMB / ConMB).

Reference: `CrossMambaFusionBlock` (vmamba.py:1814-1870) and
`ConcatMambaFusionBlock` (vmamba.py:1873-1928). Both operate channel-last on
(B, H, W, C) pairs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import LN_EPS, DropPath
from sigma_tpu.models.ss2d import ConMBSS2D, CrossMambaFusionSS2D

Dtype = Any


class CrossMambaFusionBlock(nn.Module):
    """CroMB: per-modality residual around the cross-scan op."""

    hidden_dim: int
    drop_path: float = 0.0
    d_state: int = 4
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_rgb, x_e, deterministic: bool = True):
        cross_rgb, cross_e = CrossMambaFusionSS2D(
            d_model=self.hidden_dim,
            d_state=self.d_state,
            ssm_ratio=self.ssm_ratio,
            dt_rank=self.dt_rank,
            ln_eps=self.ln_eps,
            scan_chunk=self.scan_chunk,
            dtype=self.dtype,
            name="op",
        )(x_rgb, x_e, deterministic=deterministic)
        x_rgb = x_rgb + DropPath(self.drop_path, name="drop_path1")(
            cross_rgb, deterministic=deterministic
        )
        x_e = x_e + DropPath(self.drop_path, name="drop_path2")(
            cross_e, deterministic=deterministic
        )
        return x_rgb, x_e


class ConcatMambaFusionBlock(nn.Module):
    """ConMB: x_rgb + x_e + DropPath(ConMB_SS2D(x_rgb, x_e))."""

    hidden_dim: int
    drop_path: float = 0.0
    d_state: int = 4
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_rgb, x_e, deterministic: bool = True):
        y = ConMBSS2D(
            d_model=self.hidden_dim,
            d_state=self.d_state,
            ssm_ratio=self.ssm_ratio,
            dt_rank=self.dt_rank,
            ln_eps=self.ln_eps,
            scan_chunk=self.scan_chunk,
            dtype=self.dtype,
            name="op",
        )(x_rgb, x_e, deterministic=deterministic)
        return x_rgb + x_e + DropPath(self.drop_path, name="drop_path")(
            y, deterministic=deterministic
        )
