"""Fused SS2D epilogue: cross-layout merge + LayerNorm + SiLU gate.

Reference semantics (`/root/reference/models/encoders/vmamba.py:217-224`
and `:1073-1087`): after the directional scans are pair-summed, the
row-major and transposed layouts are merged, LayerNorm'd over d_inner
(`out_norm`) and gated with `y * silu(z)`. In XLA this region runs as a
relayout copy (the wh->hw transpose), an LN fusion, and a gate fusion —
three HBM round-trips over y-sized tensors per SS2D. This kernel does
the whole epilogue in one pass: both scan outputs are read ONCE (the
transposed layout via a transposed BlockSpec index map), normalized and
gated in VMEM, and only the gated result is written:

    out[b,h,w,:] = LN(y_hw[b,h,w,:] + y_wh[b,w,h,:]) * silu(z[b,h,w,:])

All math in float32 (matching flax LayerNorm's promotion); `out` is
emitted fp32 exactly like the unfused `nn.LayerNorm` output, so the
downstream out_proj sees identical values.

Custom VJP: the bwd kernel recomputes the merge + statistics from the
same inputs (cheaper than stashing xhat) and emits dy_hw, dy_wh (written
through the transposed map), dz, and per-batch dgamma/dbeta partials
accumulated across the spatial grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _div8(n: int, cap: int):
    """Largest multiple-of-8 divisor of n that is <= cap (None if none).
    Mosaic requires the last two block dims to be divisible by (8, 128)
    or equal to the array dims; th appears second-to-last in the wh block
    and tw in the hw block, so each must be %8 — or span its whole dim."""
    for t in range(min(cap, n), 7, -1):
        if n % t == 0 and t % 8 == 0:
            return t
    return None


def _stats(s, eps):
    mu = jnp.mean(s, axis=-1, keepdims=True)
    xc = s - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    return xc, rs


def _fwd_kernel(yh_ref, yw_ref, z_ref, g_ref, b_ref, o_ref, *, eps):
    s = yh_ref[0].astype(jnp.float32) + jnp.transpose(
        yw_ref[0].astype(jnp.float32), (1, 0, 2)
    )
    xc, rs = _stats(s, eps)
    norm = (xc * rs) * g_ref[0].astype(jnp.float32) + b_ref[0].astype(
        jnp.float32
    )
    z = z_ref[0].astype(jnp.float32)
    o_ref[0] = (norm * (z * jax.nn.sigmoid(z))).astype(o_ref.dtype)


def _bwd_kernel(yh_ref, yw_ref, z_ref, g_ref, b_ref, dy_ref,
                dyh_ref, dyw_ref, dz_ref, dg_ref, db_ref, *, eps):
    ht = pl.program_id(1)
    wt = pl.program_id(2)

    @pl.when((ht == 0) & (wt == 0))
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    s = yh_ref[0].astype(jnp.float32) + jnp.transpose(
        yw_ref[0].astype(jnp.float32), (1, 0, 2)
    )
    xc, rs = _stats(s, eps)
    xhat = xc * rs
    gamma = g_ref[0].astype(jnp.float32)
    beta = b_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    sig = jax.nn.sigmoid(z)
    gate = z * sig
    dy = dy_ref[0].astype(jnp.float32)

    norm = xhat * gamma + beta
    dnorm = dy * gate
    dz = (dy * norm) * (sig * (1.0 + z * (1.0 - sig)))
    # LayerNorm backward over the minor (feature) axis
    dxhat = dnorm * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    ds = rs * (dxhat - m1 - xhat * m2)

    dyh_ref[0] = ds.astype(dyh_ref.dtype)
    dyw_ref[0] = jnp.transpose(ds, (1, 0, 2)).astype(dyw_ref.dtype)
    dz_ref[0] = dz.astype(dz_ref.dtype)
    dg_ref[...] += jnp.sum(
        (dnorm * xhat).reshape(-1, xhat.shape[-1]), axis=0
    )[None, None]
    db_ref[...] += jnp.sum(
        dnorm.reshape(-1, dnorm.shape[-1]), axis=0
    )[None, None]


def _tiles(h, w, dg):
    """(th, tw) satisfying Mosaic's block rules for BOTH layouts with
    ~<=2MB fp32 blocks; falls back to whole dims for stubborn sizes
    (15x20-class shapes are small enough whole)."""
    import os
    budget = max(64, (2 * 1024 * 1024) // (4 * dg))  # tokens per block
    th = _div8(h, int(os.environ.get("SIGMA_MLG_TH", "8")))
    tw = _div8(w, max(8, budget // (th or 8)))
    if th is not None and tw is not None:
        return th, tw
    if th is None and tw is None:
        return h, w
    if th is None:  # whole-H blocks, narrow %8 W tiles
        tw = _div8(w, max(8, budget // h))
        return h, (tw if tw is not None else w)
    # whole-W blocks, narrow %8 H tiles
    th = _div8(h, max(8, budget // w))
    return (th if th is not None else h), w


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def merge_ln_gate(y_hw, y_wh, z, gamma, beta, eps, interpret=False):
    """out = LN(y_hw + transpose(y_wh)) * silu(z), fused.

    Args:
      y_hw: (B, H, W, C) row-major scan output.
      y_wh: (B, W, H, C) transposed-layout scan output.
      z:    (B, H, W, C) gate branch (pre-silu).
      gamma, beta: (C,) LayerNorm affine.
      eps: LN epsilon (static).
    Returns (B, H, W, C) float32.
    """
    return _fwd(y_hw, y_wh, z, gamma, beta, eps, interpret)


def _fwd(y_hw, y_wh, z, gamma, beta, eps, interpret):
    b, h, w, dg = y_hw.shape
    th, tw = _tiles(h, w, dg)
    grid = (b, h // th, w // tw)
    blk_hw = pl.BlockSpec((1, th, tw, dg), lambda bi, hi, wi: (bi, hi, wi, 0),
                          memory_space=pltpu.VMEM)
    blk_wh = pl.BlockSpec((1, tw, th, dg), lambda bi, hi, wi: (bi, wi, hi, 0),
                          memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, dg), lambda bi, hi, wi: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[blk_hw, blk_wh, blk_hw, vec, vec],
        out_specs=blk_hw,
        out_shape=jax.ShapeDtypeStruct((b, h, w, dg), jnp.float32),
        interpret=interpret,
    )(y_hw, y_wh, z, gamma.reshape(1, dg), beta.reshape(1, dg))


def _vjp_fwd(y_hw, y_wh, z, gamma, beta, eps, interpret):
    out = _fwd(y_hw, y_wh, z, gamma, beta, eps, interpret)
    return out, (y_hw, y_wh, z, gamma, beta)


def _vjp_bwd(eps, interpret, res, dy):
    y_hw, y_wh, z, gamma, beta = res
    b, h, w, dg = y_hw.shape
    th, tw = _tiles(h, w, dg)
    grid = (b, h // th, w // tw)
    blk_hw = pl.BlockSpec((1, th, tw, dg), lambda bi, hi, wi: (bi, hi, wi, 0),
                          memory_space=pltpu.VMEM)
    blk_wh = pl.BlockSpec((1, tw, th, dg), lambda bi, hi, wi: (bi, wi, hi, 0),
                          memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, dg), lambda bi, hi, wi: (0, 0),
                       memory_space=pltpu.VMEM)
    # (b, 1, dg) partials: a (1, 1, dg) block's minor dims equal the
    # array's, satisfying Mosaic's block rules for any b
    acc = pl.BlockSpec((1, 1, dg), lambda bi, hi, wi: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    dyh, dyw, dz, dgb, dbb = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=grid,
        in_specs=[blk_hw, blk_wh, blk_hw, vec, vec, blk_hw],
        out_specs=(blk_hw, blk_wh, blk_hw, acc, acc),
        out_shape=(
            jax.ShapeDtypeStruct(y_hw.shape, y_hw.dtype),
            jax.ShapeDtypeStruct(y_wh.shape, y_wh.dtype),
            jax.ShapeDtypeStruct(z.shape, z.dtype),
            jax.ShapeDtypeStruct((b, 1, dg), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, dg), jnp.float32),
        ),
        interpret=interpret,
    )(y_hw, y_wh, z, gamma.reshape(1, dg), beta.reshape(1, dg), dy)
    return (dyh, dyw, dz,
            dgb.sum(axis=(0, 1)).astype(gamma.dtype),
            dbb.sum(axis=(0, 1)).astype(beta.dtype))


merge_ln_gate.defvjp(_vjp_fwd, _vjp_bwd)


def merge_ln_gate_ref(y_hw, y_wh, z, gamma, beta, eps):
    """Pure-XLA reference (the unfused epilogue), for parity tests."""
    s = y_hw.astype(jnp.float32) + jnp.transpose(
        y_wh.astype(jnp.float32), (0, 2, 1, 3)
    )
    mu = jnp.mean(s, axis=-1, keepdims=True)
    xc = s - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    norm = xc * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    return norm * jax.nn.silu(zf)
