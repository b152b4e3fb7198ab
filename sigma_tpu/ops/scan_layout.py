"""2-D and multimodal scan-order layout transforms.

Pure reshape/transpose/flip ops — the JAX/XLA analogue of the reference's
custom-autograd `CrossScan`/`CrossMerge` (`/root/reference/models/encoders/
vmamba.py:80-121`) and `CrossScan_multimodal`/`CrossMerge_multimodal`
(`vmamba.py:123-163`). No custom VJPs are needed: XLA differentiates and
fuses layout ops, and the adjoint of the scan expansion is exactly the merge
(and vice versa), which is what the reference hand-writes.

Convention: channel-last. Images are (B, H, W, C); scan sequences are
(B, K, L, C) so the downstream projections contract the trailing C on the
MXU without re-layout.

Direction order matches the reference:
  k=0: row-major H*W      k=1: column-major W*H (transpose)
  k=2: reversed k=0       k=3: reversed k=1
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_scan(x):
    """(B, H, W, C) -> (B, 4, H*W, C) four scan directions."""
    b, h, w, c = x.shape
    hw = x.reshape(b, h * w, c)
    wh = jnp.swapaxes(x, 1, 2).reshape(b, h * w, c)
    fwd = jnp.stack([hw, wh], axis=1)  # (B, 2, L, C)
    return jnp.concatenate([fwd, fwd[:, :, ::-1]], axis=1)


def cross_merge(ys, h, w):
    """(B, 4, H*W, C) -> (B, H, W, C) inverse-layout sum of 4 directions."""
    b, k, l, c = ys.shape
    if k != 4 or l != h * w:
        raise ValueError(f"bad shape {ys.shape} for h={h}, w={w}")
    fwd = ys[:, 0:2] + ys[:, 2:4, ::-1]
    y_hw = fwd[:, 0]
    y_wh = jnp.swapaxes(fwd[:, 1].reshape(b, w, h, c), 1, 2).reshape(b, l, c)
    return (y_hw + y_wh).reshape(b, h, w, c)


def cross_scan_multimodal(x_rgb, x_e):
    """(B, H, W, C) x2 -> (B, 2, 2*H*W, C) concat scan + its reverse."""
    b, h, w, c = x_rgb.shape
    seq = jnp.concatenate(
        [x_rgb.reshape(b, h * w, c), x_e.reshape(b, h * w, c)], axis=1
    )
    return jnp.stack([seq, seq[:, ::-1]], axis=1)


def cross_merge_multimodal(ys):
    """(B, 2, 2L, C) -> ((B, L, C), (B, L, C)) per-modality merged outputs."""
    b, k, l2, c = ys.shape
    if k != 2:
        raise ValueError(f"expected K=2, got {ys.shape}")
    l = l2 // 2
    y = ys[:, 0] + ys[:, 1, ::-1]
    return y[:, :l], y[:, l:]
