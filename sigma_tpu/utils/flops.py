"""Parameter counts and FLOPs accounting.

TPU-native counterpart of the reference's fvcore-based tools
(`/root/reference/utils/calculate_params.py`,
`utils/calculate_flops_ConMB.py`, `models/builder.py:168-245`): parameters
are counted from the pytree; FLOPs come from XLA's compiled cost analysis,
with the selective scan's closed form 9*B*L*D*N (+B*D*L with the D skip)
(`vmamba.py:435-456`) available analytically, plus the ConMB-vs-attention
scaling study in closed form (`calculate_flops_ConMB.py:747-937`).

Run as a script:
  python -m sigma_tpu.utils.flops -n mfnet --backbone sigma_tiny
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def param_count(params: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def selective_scan_flops(B: int, L: int, D: int, N: int,
                         with_D: bool = True, with_Z: bool = False) -> int:
    """Closed-form scan FLOPs (vmamba.py:435-456)."""
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_Z:
        flops += B * D * L
    return flops


def conmb_flops(HW: int, C: int, d_state: int = 4, ssm_ratio: float = 2.0,
                dt_rank=None) -> int:
    """Analytic ConMB (concat multimodal scan) FLOPs for one fusion block at
    an HW-token stage with C channels — the subject of the reference's
    scaling study (calculate_flops_ConMB.py)."""
    d_inner = int(ssm_ratio * C)
    r = dt_rank or math.ceil(C / 16)
    L = 2 * HW
    K = 2
    fl = 0
    fl += 2 * 2 * HW * C * d_inner  # two in_proj
    fl += 2 * HW * d_inner * 9 * 2  # two dwconv3x3
    fl += 2 * K * L * d_inner * (r + 2 * d_state)  # x_proj
    fl += 2 * K * L * r * d_inner  # dt_proj
    fl += selective_scan_flops(1, L, K * d_inner, d_state)
    fl += 2 * 2 * HW * d_inner * (d_inner // 16) * 2  # SE gates
    fl += 2 * HW * (2 * d_inner) * C  # out_proj
    return fl


def attention_fusion_flops(HW: int, C: int) -> int:
    """Concat self-attention fusion over L=2HW tokens (the ConSA baseline in
    the reference study): qkv + attention + proj."""
    L = 2 * HW
    fl = 2 * L * C * 3 * C  # qkv
    fl += 2 * L * L * C * 2  # QK^T and AV
    fl += 2 * L * C * C  # out proj
    return fl


def xla_flops(fn, *args) -> float:
    """FLOPs of a jitted function per XLA's compiled cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    stats = compiled.cost_analysis()
    if isinstance(stats, list):  # older jax returns a per-device list
        stats = stats[0]
    return float(stats.get("flops", -1.0))


def model_stats(model, variables, input_hw=(480, 640)) -> dict:
    h, w = input_hw
    rgb = jnp.zeros((1, h, w, 3), jnp.float32)
    mx = jnp.zeros((1, h, w, 3), jnp.float32)

    def fwd(v, a, b):
        return model.apply(v, a, b)

    return {
        "params": param_count(variables["params"]),
        "flops": xla_flops(fwd, variables, rgb, mx),
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("-n", "--dataset", default="mfnet")
    p.add_argument("--backbone", default="sigma_tiny")
    p.add_argument("--decoder", default="MambaDecoder")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    args = p.parse_args(argv)

    from configs import get_config
    from sigma_tpu.models.builder import build_model

    cfg = get_config(args.dataset)
    object.__setattr__(cfg, "backbone", args.backbone)
    object.__setattr__(cfg, "decoder", args.decoder)
    h = args.height or cfg.image_height
    w = args.width or cfg.image_width

    model = build_model(cfg)
    rgb = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, rgb)
    stats = model_stats(model, variables, (h, w))
    print(
        f"{args.backbone}+{args.decoder} @ {h}x{w}: "
        f"params {stats['params'] / 1e6:.2f}M, "
        f"GFLOPs {stats['flops'] / 1e9:.2f}"
    )


if __name__ == "__main__":
    main()
