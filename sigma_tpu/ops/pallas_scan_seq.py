"""Sequential-over-L Pallas selective-scan kernels (channel-last).

The fastest TPU formulation found for the Mamba-1 recurrence: channels ride
the LANES, the state (N, dg) is updated position-by-position in an unrolled
`fori_loop` — the exact sequential semantics of the reference CUDA kernel
(`selective_scan_fwd_kernel.cuh`), with B_t/C_t broadcast for free from
(N, 1) slices. ~2.3x faster than the lane-doubling kernel in
`pallas_scan.py` at Sigma's shapes AND bit-exact against the sequential
reference (no reassociation at all).

Interface is channel-last — (batch*groups, L, dg) — which is the layout the
SS2D projection pipeline already produces, eliminating the (B,K,L,D) ->
(B,KD,L) transposes of the channel-first API.

Backward: reverse block sweep with per-block forward-state recompute from
saved carries (the reference's checkpoint design, `selective_scan.cpp:228`)
and a sequential adjoint loop producing all operand gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_UNROLL = 16


def _unroll_for(dg: int) -> int:
    # Mosaic requires >=8-aligned dynamic sublane block slices, so the
    # unroll stays at 16; wide-channel VMEM pressure is handled by routing
    # per-step states through scratch instead of live SSA values.
    del dg
    return _UNROLL


def _fwd_kernel(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, hck_ref, h_scr,
                *, T, n_state, unroll):
    il = pl.program_id(1)

    @pl.when(il == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    hck_ref[0, 0] = h_scr[...]  # carry INTO this block
    A = a_ref[...]  # (N, dg)

    def body(i, h):
        t0 = i * unroll
        d_blk = d_ref[0, pl.ds(t0, unroll), :]  # (U, dg)
        u_blk = u_ref[0, pl.ds(t0, unroll), :]
        b_blk = b_ref[0, pl.ds(t0, unroll), :]  # (U, N)
        c_blk = c_ref[0, pl.ds(t0, unroll), :]
        ys = []
        for k in range(unroll):
            dt = d_blk[k][None, :]  # (1, dg)
            ut = u_blk[k][None, :]
            a_t = jnp.exp(dt * A)  # (N, dg)
            h = a_t * h + (dt * ut) * b_blk[k][:, None]
            ys.append(jnp.sum(c_blk[k][:, None] * h, axis=0))
        y_ref[0, pl.ds(t0, unroll), :] = jnp.stack(ys, axis=0)
        return h

    h = jax.lax.fori_loop(0, T // unroll, body, h_scr[...])
    h_scr[...] = h


def _bwd_kernel(u_ref, d_ref, a_ref, b_ref, c_ref, hck_ref, dy_ref,
                du_ref, dd_ref, dA_ref, dB_ref, dC_ref,
                dh_scr, dA_scr, hstash_scr, hloc_scr,
                *, T, n_state, unroll, nl):
    j = pl.program_id(1)  # reversed block sweep (via index maps)

    @pl.when(j == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dA_scr[...] = jnp.zeros_like(dA_scr)

    A = a_ref[...]  # (N, dg)
    h0 = hck_ref[0, 0]  # (N, dg) carry INTO this block

    # --- forward pass storing a state checkpoint every `unroll` steps ---
    def fwd_body(i, h):
        hstash_scr[i] = h
        t0 = i * unroll
        d_blk = d_ref[0, pl.ds(t0, unroll), :]
        u_blk = u_ref[0, pl.ds(t0, unroll), :]
        b_blk = b_ref[0, pl.ds(t0, unroll), :]
        for k in range(unroll):
            dt = d_blk[k][None, :]
            ut = u_blk[k][None, :]
            a_t = jnp.exp(dt * A)
            h = a_t * h + (dt * ut) * b_blk[k][:, None]
        return h

    jax.lax.fori_loop(0, T // unroll, fwd_body, h0)

    # --- reverse adjoint sweep with intra-chunk recompute ---
    # per-step states go through the hloc scratch (not live SSA values) so
    # the scoped-VMEM stack stays small even for wide dg
    def bwd_body(i, dh):
        # t runs T-1 .. 0 in unroll-sized chunks
        ci = T // unroll - 1 - i
        t0 = ci * unroll
        d_blk = d_ref[0, pl.ds(t0, unroll), :]
        u_blk = u_ref[0, pl.ds(t0, unroll), :]
        b_blk = b_ref[0, pl.ds(t0, unroll), :]
        c_blk = c_ref[0, pl.ds(t0, unroll), :]
        dy_blk = dy_ref[0, pl.ds(t0, unroll), :]
        # recompute h_{t-1} for the chunk from the checkpoint
        h = hstash_scr[ci]
        for k in range(unroll):
            hloc_scr[k] = h
            dt = d_blk[k][None, :]
            ut = u_blk[k][None, :]
            a_t = jnp.exp(dt * A)
            h = a_t * h + (dt * ut) * b_blk[k][:, None]
        dA_acc = jnp.zeros_like(dA_scr[...])
        for k in reversed(range(unroll)):
            dt = d_blk[k][None, :]
            ut = u_blk[k][None, :]
            bt = b_blk[k][:, None]
            ct = c_blk[k][:, None]
            dyt = dy_blk[k][None, :]
            h_prev = hloc_scr[k]  # (N, dg)
            a_t = jnp.exp(dt * A)
            h_t = a_t * h_prev + (dt * ut) * bt
            dh = dh + ct * dyt  # dy contribution at t
            du_ref[0, t0 + k, :] = jnp.sum(dh * dt * bt, axis=0)
            dd_ref[0, t0 + k, :] = jnp.sum(
                dh * (A * a_t * h_prev + bt * ut), axis=0
            )
            dA_acc = dA_acc + dh * a_t * h_prev * dt
            dB_ref[0, t0 + k, :] = jnp.sum(dh * (dt * ut), axis=1)
            dC_ref[0, t0 + k, :] = jnp.sum(h_t * dyt, axis=1)
            dh = dh * a_t  # propagate to t-1
        dA_scr[...] = dA_scr[...] + dA_acc
        return dh

    dh = jax.lax.fori_loop(0, T // unroll, bwd_body, dh_scr[...])
    dh_scr[...] = dh
    dA_ref[0] = dA_scr[...]


def _block_t(dg: int, n_state: int, want: int = 512) -> int:
    # keep ~<=6MB of VMEM across the staged blocks (6 (T,dg) buffers in bwd)
    budget = 4 * 1024 * 1024
    u = _unroll_for(dg)
    t = max(u, min(want, budget // (6 * 4 * max(dg, 1))))
    t -= t % u
    return max(t, u)


def _fwd_call(u, d, a_r, b, c, G, T, interpret):
    bg, L, dg = u.shape
    N = a_r.shape[0] // G
    nl = L // T
    grid = (bg, nl)
    kernel = functools.partial(
        _fwd_kernel, T=T, n_state=N, unroll=_unroll_for(dg)
    )
    y, hck = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, dg), lambda b_, j, G=G: (b_ % G, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, dg), lambda b_, j: (b_, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, L, dg), jnp.float32),
            jax.ShapeDtypeStruct((bg, nl, N, dg), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((N, dg), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=9 * bg * L * dg * N,
            bytes_accessed=4 * bg * L * (3 * dg + 2 * N),
            transcendentals=bg * L * dg * N,
        ),
        interpret=interpret,
    )(u, d, a_r, b, c)
    return y, hck


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _scan_core_cl(u, d, a_r, b, c, G, T, interpret):
    y, _ = _fwd_call(u, d, a_r, b, c, G, T, interpret)
    return y


def _scan_core_cl_fwd(u, d, a_r, b, c, G, T, interpret):
    y, hck = _fwd_call(u, d, a_r, b, c, G, T, interpret)
    return y, (u, d, a_r, b, c, hck)


def _scan_core_cl_bwd(G, T, interpret, res, dy):
    u, d, a_r, b, c, hck = res
    bg, L, dg = u.shape
    N = a_r.shape[0] // G
    nl = L // T

    def rev(j):
        return nl - 1 - j

    kernel = functools.partial(
        _bwd_kernel, T=T, n_state=N, unroll=_unroll_for(dg), nl=nl
    )
    du, dd, dA_bg, dB, dC = pl.pallas_call(
        kernel,
        grid=(bg, nl),
        in_specs=[
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, dg), lambda b_, j, G=G: (b_ % G, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, dg), lambda b_, j: (b_, rev(j), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, dg), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dg), lambda b_, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_, j: (b_, rev(j), 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, L, dg), jnp.float32),
            jax.ShapeDtypeStruct((bg, L, dg), jnp.float32),
            jax.ShapeDtypeStruct((bg, N, dg), jnp.float32),
            jax.ShapeDtypeStruct((bg, L, N), jnp.float32),
            jax.ShapeDtypeStruct((bg, L, N), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, dg), jnp.float32),  # dh carry
            pltpu.VMEM((N, dg), jnp.float32),  # dA accumulator
            pltpu.VMEM((T // _unroll_for(dg), N, dg), jnp.float32),  # h ckpts
            pltpu.VMEM((_UNROLL, N, dg), jnp.float32),  # per-step states
        ],
        interpret=interpret,
    )(u, d, a_r, b, c, hck, dy)

    batch = bg // G
    dA = dA_bg.reshape(batch, G, N, dg).sum(axis=0)  # (G, N, dg)
    return du, dd, dA.reshape(G * N, dg), dB, dC


_scan_core_cl.defvjp(_scan_core_cl_fwd, _scan_core_cl_bwd)


def selective_scan_seq_cl(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False,
    block_t: int = 512, interpret: bool | None = None,
):
    """Channel-last selective scan.

    Args:
      u, delta: (bg, L, dg) where bg = batch*groups.
      A: (G, N, dg) negative state matrix (per group, transposed layout).
      B, C: (bg, L, N).
      D: (G, dg) optional skip; delta_bias: (G, dg) optional.
    Returns y (bg, L, dg), fp32 compute, dtype-preserving.
    """
    dtype_in = u.dtype
    bg, L, dg = u.shape
    G, N, _ = A.shape

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    uf = u.astype(jnp.float32)
    d_eff = delta.astype(jnp.float32)
    if delta_bias is not None:
        # rows of bg are (batch, G) flattened, so tiling (G, dg) over the
        # batch lines the bias up with each row's group
        bias_bg = jnp.tile(delta_bias.astype(jnp.float32), (bg // G, 1))
        d_eff = d_eff + bias_bg.reshape(bg, 1, dg)
    if delta_softplus:
        d_eff = jax.nn.softplus(d_eff)

    b_f = B.astype(jnp.float32)
    c_f = C.astype(jnp.float32)
    a_f = A.astype(jnp.float32)

    # Mosaic wants the (N, dg) A-blocks 8-sublane aligned: pad the state dim
    # with A=0 / B=0 rows (a=exp(0)=1 and b=0 keep the padded states at 0).
    npad = (-N) % 8
    if npad:
        a_f = jnp.pad(a_f, ((0, 0), (0, npad), (0, 0)))
        b_f = jnp.pad(b_f, ((0, 0), (0, 0), (0, npad)))
        c_f = jnp.pad(c_f, ((0, 0), (0, 0), (0, npad)))
        N = N + npad

    T = _block_t(dg, N, block_t)
    pad = (-L) % T
    if pad:
        uf_p = jnp.pad(uf, ((0, 0), (0, pad), (0, 0)))
        d_p = jnp.pad(d_eff, ((0, 0), (0, pad), (0, 0)))
        b_p = jnp.pad(b_f, ((0, 0), (0, pad), (0, 0)))
        c_p = jnp.pad(c_f, ((0, 0), (0, pad), (0, 0)))
    else:
        uf_p, d_p, b_p, c_p = uf, d_eff, b_f, c_f

    a_r = a_f.reshape(G * N, dg)
    y = _scan_core_cl(uf_p, d_p, a_r, b_p, c_p, G, T, interpret)
    if pad:
        y = y[:, :L]
    if D is not None:
        y = y + jnp.tile(D.astype(jnp.float32), (bg // G, 1)).reshape(
            bg, 1, dg
        ) * uf
    return y.astype(dtype_in)
