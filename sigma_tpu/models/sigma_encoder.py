"""Siamese VMamba RGB-X encoder.

Reference: `RGBXTransformer` (`/root/reference/models/encoders/
dual_vmamba.py:17-111`): ONE weight-shared VSSM trunk applied to both
modalities, then per-stage CroMB -> ConMB fusion.

TPU design note: instead of two sequential trunk passes
(`dual_vmamba.py:85-86`), the two modalities are stacked on the batch axis
and the trunk runs ONCE at 2B — mathematically identical (weights are
shared), and it halves the number of XLA program invocations while doubling
the batch each kernel sees, which is strictly better for MXU utilization.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import LN_EPS
from sigma_tpu.models.fusion import ConcatMambaFusionBlock, CrossMambaFusionBlock
from sigma_tpu.models.vssm import (
    VSSMBackbone, remat_policy, should_remat,
)

Dtype = Any


class SigmaEncoder(nn.Module):
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    fusion_d_state: int = 4
    ssm_ratio: float = 2.0
    mlp_ratio: float = 0.0
    drop_path_rate: float = 0.2
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    remat: Any = True  # bool | int token threshold (vssm.should_remat)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_rgb, x_e, deterministic: bool = True):
        b = x_rgb.shape[0]
        trunk = VSSMBackbone(
            depths=self.depths,
            dims=self.dims,
            d_state=self.d_state,
            ssm_ratio=self.ssm_ratio,
            mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.drop_path_rate,
            ln_eps=self.ln_eps,
            scan_chunk=self.scan_chunk,
            remat=self.remat,
            dtype=self.dtype,
            name="vssm",
        )
        # Siamese: one trunk pass over the stacked modalities.
        outs = trunk(
            jnp.concatenate([x_rgb, x_e], axis=0), deterministic=deterministic
        )

        fused = []
        for i, o in enumerate(outs):
            if should_remat(self.remat, o.shape[1] * o.shape[2]):
                cromb_cls = nn.remat(CrossMambaFusionBlock, static_argnums=(3,),
                                     policy=remat_policy())
                conmb_cls = nn.remat(ConcatMambaFusionBlock, static_argnums=(3,),
                                     policy=remat_policy())
            else:
                cromb_cls = CrossMambaFusionBlock
                conmb_cls = ConcatMambaFusionBlock
            o_rgb, o_e = o[:b], o[b:]
            o_rgb, o_e = cromb_cls(
                hidden_dim=self.dims[i],
                d_state=self.fusion_d_state,
                ssm_ratio=self.ssm_ratio,
                ln_eps=self.ln_eps,
                scan_chunk=self.scan_chunk,
                dtype=self.dtype,
                name=f"cross_mamba_{i}",
            )(o_rgb, o_e, deterministic)
            fused.append(
                conmb_cls(
                    hidden_dim=self.dims[i],
                    d_state=self.fusion_d_state,
                    ssm_ratio=self.ssm_ratio,
                    ln_eps=self.ln_eps,
                    scan_chunk=self.scan_chunk,
                    dtype=self.dtype,
                    name=f"channel_attn_mamba_{i}",
                )(o_rgb, o_e, deterministic)
            )
        return fused


# Variant registry mirroring dual_vmamba.py:113-144 (plus a miniature
# variant for tests / multi-chip dry runs).
SIGMA_VARIANTS = {
    "sigma_test": dict(
        depths=(1, 1, 2, 1), dims=(16, 32, 64, 128), drop_path_rate=0.1
    ),
    # parity-test scale: smallest dims where the reference ChannelAttention
    # squeeze (dim // 30) stays non-degenerate (vmamba.py:1731)
    "sigma_mini": dict(
        depths=(1, 1, 2, 1), dims=(32, 64, 128, 256), drop_path_rate=0.1
    ),
    "sigma_tiny": dict(
        depths=(2, 2, 9, 2), dims=(96, 192, 384, 768), drop_path_rate=0.2
    ),
    "sigma_small": dict(
        depths=(2, 2, 27, 2), dims=(96, 192, 384, 768), drop_path_rate=0.3
    ),
    "sigma_base": dict(
        depths=(2, 2, 27, 2), dims=(128, 256, 512, 1024), drop_path_rate=0.6
    ),
}
