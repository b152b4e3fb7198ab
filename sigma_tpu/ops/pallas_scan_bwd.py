"""Pallas TPU backward kernel for the selective scan.

Mirrors the reference backward design (`selective_scan_bwd_kernel.cuh`):
the forward saves per-chunk carry states (`x` in `selective_scan.cpp:228`);
the backward walks chunks in REVERSE, recomputes the intra-chunk forward
scan from the saved carry, and evaluates the adjoint recurrence

    dh_t = C_t * dy_t + a_{t+1} * dh_{t+1}

as a suffix (reverse) scan — the Pallas analogue of the reference's
`BlockReverseScan` (`reverse_scan.cuh:202`). Per-parameter adjoints:

    du_t     = sum_n delta_t B_t[n] dh_t[n]            (+ D dy outside)
    ddelta_t = sum_n dh_t[n] (A[n] a_t[n] h_{t-1}[n] + B_t[n] u_t)
    dA[n]   += sum_t dh_t[n] delta_t a_t[n] h_{t-1}[n]
    dB[n,t]  = sum_d delta u dh                         (per group)
    dC[n,t]  = sum_d h dh/(dh?) -> sum_d h_t[n] dy_t    (since y = <C,h>)

Grid: (batch*groups, l_chunks, d_blocks) — d innermost so dB/dC accumulate
over d-blocks in VMEM and write once per chunk; per-d-block dh carries live
in a (dg, N) scratch indexed by the d-block id, staying valid across the
sequential chunk sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _doubling_scan(a, b, lane, lc):
    """In-place pair scan: returns (a_scan, b_scan) with
    h_t = a..a cumulative products / recurrences along lanes."""
    k = 1
    while k < lc:
        a_sh = pltpu.roll(a, k, 2)
        b_sh = pltpu.roll(b, k, 2)
        mask = lane >= k
        b = jnp.where(mask, a * b_sh + b, b)
        a = jnp.where(mask, a * a_sh, a)
        k *= 2
    return a, b


def _bwd_kernel(
    u_ref, d_ref, dnext_ref, a_ref, b_ref, c_ref, hck_ref, dy_ref,
    du_ref, dd_ref, dA_ref, dB_ref, dC_ref,
    dh_carry, dA_acc, dB_acc, dC_acc,
    *, lc, nd, nl,
):
    j = pl.program_id(1)  # chunk sweep (reversed via index maps)
    i = pl.program_id(2)  # d-block
    db = u_ref.shape[1]

    @pl.when(j == 0)
    def _():
        dh_carry[pl.ds(i * db, db), :] = jnp.zeros((db, dh_carry.shape[1]),
                                                   jnp.float32)

    delta = d_ref[0]  # (DB, LC)
    u = u_ref[0]
    A = a_ref[...]  # (DB, N)
    bmat = b_ref[0]  # (N, LC)
    cmat = c_ref[0]
    dy = dy_ref[0]  # (DB, LC)
    h0 = hck_ref[0, 0]  # (DB, N) carry INTO this chunk

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lc), 2)

    # --- recompute intra-chunk forward scan ---
    s = delta[:, None, :] * A[:, :, None]
    a = jnp.exp(s)
    b = (delta * u)[:, None, :] * bmat[None, :, :]
    a_s, b_s = _doubling_scan(a, b, lane, lc)
    h = b_s + a_s * h0[:, :, None]  # (DB, N, LC)
    # h_{t-1}: shift right, fill first with h0
    h_prev = pltpu.roll(h, 1, 2)
    h_prev = jnp.where(lane >= 1, h_prev, h0[:, :, None])

    # --- adjoint reverse scan ---
    # a_next[t] = a_{t+1}; last lane takes exp(delta_next_first * A)
    d_next = dnext_ref[0]  # (DB, LC) delta of the chunk to the RIGHT
    a_bound = jnp.exp(d_next[:, 0][:, None] * A)  # (DB, N)
    a_next = pltpu.roll(a, lc - 1, 2)  # left-shift by one (circular)
    a_next = jnp.where(lane < lc - 1, a_next, a_bound[:, :, None])

    g = cmat[None, :, :] * dy[:, None, :]  # (DB, N, LC)
    # suffix doubling scan (Mosaic has no lane-reverse): after K steps
    # s[t] = sum_{r>=t} (prod_{q=t..r-1} a'_q) g_r and
    # p[t] = prod_{q=t..lc-1} a'_q, with a'_t = a_{t+1}.
    p, s = a_next, g
    k = 1
    while k < lc:
        p_sh = pltpu.roll(p, lc - k, 2)  # value at t+k
        s_sh = pltpu.roll(s, lc - k, 2)
        mask = lane < lc - k
        s = jnp.where(mask, s + p * s_sh, s)
        p = jnp.where(mask, p * p_sh, p)
        k *= 2
    carry = dh_carry[pl.ds(i * db, db), :]
    dh = s + p * carry[:, :, None]  # (DB, N, LC)
    dh_carry[pl.ds(i * db, db), :] = dh[:, :, 0]

    # --- parameter adjoints ---
    du_ref[0] = jnp.sum(dh * (delta[:, None, :] * bmat[None, :, :]), axis=1)
    dd_ref[0] = jnp.sum(
        dh * (A[:, :, None] * a * h_prev + (bmat[None, :, :] * u[:, None, :])),
        axis=1,
    )
    dA_term = jnp.sum(dh * a * h_prev * delta[:, None, :], axis=2)  # (DB, N)
    prev_dA = jnp.where(j > 0, dA_acc[pl.ds(i * db, db), :], 0.0)
    dA_acc[pl.ds(i * db, db), :] = prev_dA + dA_term
    # write the running partial every step: the last revisit (j == nl-1)
    # leaves the complete sum in HBM, and earlier partial write-backs are
    # simply overwritten (Pallas copies output buffers back on every step).
    dA_ref[0] = dA_acc[pl.ds(i * db, db), :]

    dB_term = jnp.sum(dh * (delta * u)[:, None, :], axis=0)  # (N, LC)
    dC_term = jnp.sum(h * dy[:, None, :], axis=0)  # (N, LC)
    prev_dB = jnp.where(i > 0, dB_acc[...], 0.0)
    prev_dC = jnp.where(i > 0, dC_acc[...], 0.0)
    dB_acc[...] = prev_dB + dB_term
    dC_acc[...] = prev_dC + dC_term
    dB_ref[0] = dB_acc[...]
    dC_ref[0] = dC_acc[...]


def selective_scan_pallas_bwd(
    u, delta_eff, A_r, B, C, h_ckpt, dy, groups: int,
    d_block: int = 64, l_chunk: int = 256, interpret: bool | None = None,
):
    """Backward pass on pre-padded/reshaped operands:
      u, delta_eff, dy: (BG, dg, L) with dg%8==0, L%lc==0
      A_r: (G*dg, N); B, C: (BG, N, L)
      h_ckpt: (BG, nl, dg, N) carries INTO each chunk.
    Returns (du, ddelta, dA per-bg (BG, dg, N), dB, dC).
    """
    bg, dg, L = u.shape
    N = A_r.shape[1]
    G = groups

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    db = min(d_block, dg)
    db -= db % 8
    db = max(db, 8)
    while dg % db:
        db -= 8
    nd = dg // db
    lc = L if L <= l_chunk else max(128, l_chunk - l_chunk % 128)
    assert L % lc == 0, (L, lc)
    nl = L // lc
    assert h_ckpt.shape == (bg, nl, dg, N), (h_ckpt.shape, (bg, nl, dg, N))

    # chunk sweep is reversed; the "right chunk" delta block feeds the
    # adjoint boundary a_{t+1} at the chunk edge (clamped at the sequence
    # end, where it multiplies dh_carry=0 and is unused)
    def rev(j):
        return nl - 1 - j

    grid = (bg, nl, nd)
    kernel = functools.partial(_bwd_kernel, lc=lc, nd=nd, nl=nl)

    out_shapes = (
        jax.ShapeDtypeStruct((bg, dg, L), jnp.float32),  # du
        jax.ShapeDtypeStruct((bg, dg, L), jnp.float32),  # ddelta
        jax.ShapeDtypeStruct((bg, dg, N), jnp.float32),  # dA (per bg)
        jax.ShapeDtypeStruct((bg, N, L), jnp.float32),  # dB
        jax.ShapeDtypeStruct((bg, N, L), jnp.float32),  # dC
    )
    du, dd, dA_bg, dB, dC = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, db, lc), lambda b, j, i: (b, i, rev(j)),
                         memory_space=pltpu.VMEM),  # u
            pl.BlockSpec((1, db, lc), lambda b, j, i: (b, i, rev(j)),
                         memory_space=pltpu.VMEM),  # delta
            pl.BlockSpec(
                (1, db, lc),
                lambda b, j, i: (b, i, jnp.minimum(rev(j) + 1, nl - 1)),
                memory_space=pltpu.VMEM,
            ),  # delta of right-neighbor chunk
            pl.BlockSpec((db, N), lambda b, j, i: ((b % G) * nd + i, 0),
                         memory_space=pltpu.VMEM),  # A rows for this block
            pl.BlockSpec((1, N, lc), lambda b, j, i: (b, 0, rev(j)),
                         memory_space=pltpu.VMEM),  # B
            pl.BlockSpec((1, N, lc), lambda b, j, i: (b, 0, rev(j)),
                         memory_space=pltpu.VMEM),  # C
            pl.BlockSpec((1, 1, db, N), lambda b, j, i: (b, rev(j), i, 0),
                         memory_space=pltpu.VMEM),  # h_ckpt
            pl.BlockSpec((1, db, lc), lambda b, j, i: (b, i, rev(j)),
                         memory_space=pltpu.VMEM),  # dy
        ],
        out_specs=(
            pl.BlockSpec((1, db, lc), lambda b, j, i: (b, i, rev(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db, lc), lambda b, j, i: (b, i, rev(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db, N), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, lc), lambda b, j, i: (b, 0, rev(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, lc), lambda b, j, i: (b, 0, rev(j)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((dg, N), jnp.float32),  # dh carries per d-block
            pltpu.VMEM((dg, N), jnp.float32),  # dA accumulator
            pltpu.VMEM((N, lc), jnp.float32),  # dB accumulator
            pltpu.VMEM((N, lc), jnp.float32),  # dC accumulator
        ],
        interpret=interpret,
    )(u, delta_eff, delta_eff, A_r, B, C, h_ckpt, dy)

    return du, dd, dA_bg, dB, dC
