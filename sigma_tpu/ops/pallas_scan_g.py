"""Fused-group sequential Pallas selective scan (channel-last, G chains).

Generalizes `pallas_scan_seq.py` by carrying G independent recurrence chains
per grid step as a leading dim: every (1, G, T, dg) block update runs G
data-independent h-chains back-to-back, so the VPU pipelines them instead of
stalling on one chain's FMA latency. This replaces the reference CUDA
kernel's grid-level parallelism over (batch, dim-row)
(`selective_scan_fwd_kernel.cuh:226-238`) — a TPU core runs Pallas grid
steps *sequentially*, so parallel work must live inside one grid step.

Like the reference kernel (and unlike v1 of this file), the delta bias,
softplus, and the D-skip are fused INTO the kernel: the XLA-side softplus /
pad / slice / D-skip passes were measured at +5.8 ms on a 4.0 ms stage-1
kernel call (experiments/scan_g_ab.py). Block length T is chosen to divide
L whenever possible so no padding pass is emitted at all.

Semantics per chain g (identical to `selective_scan_ref`,
`selective_scan_interface.py:86-131`):
    d_eff = softplus(delta + bias)          [flags static]
    h_t = exp(d_eff_t * A_g) * h_{t-1} + (d_eff_t * u_t) * B_t
    y_t = <C_t, h_t> + D_g * u_t

Layouts (channel-last, fp32 compute):
    u, delta : (B, G, L, dg)
    A        : (G, N, dg)   negative, already -exp(A_log)
    Bm, Cm   : (B, G, L, N)
    bias, Dk : (G, dg)
    y        : (B, G, L, dg)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_UNROLL = 8  # bwd chunk size; 8 measured best (16 was +0.4ms, r3 sweep)

# fwd state checkpoints land every _CK_RATIO bwd chunks (32 tokens): the bwd
# kernel recomputes at most _CK_RATIO-1 sub-chunks to reach a chunk's carry.
# Quarters the hck tensor — the dominant HBM stream of training (943MB per
# stage-1 SS2D call at ck=8) — and makes no-remat training residuals fit.
_CK_RATIO = 1

# The Mosaic default scoped-VMEM limit is 16MB but physical VMEM on v5e is
# far larger; raise the cap so the bwd state stash and double-buffered
# blocks fit with useful T.
_VMEM_LIMIT = 56 * 1024 * 1024

# The kernels compute exp(dt*A) as exp2(dt*(A*log2e)): exp2 measured 2480
# vs exp's 2000 Gop/s on the v5e VPU (experiments/exp_probe.py). Wrappers
# pre-scale A by _LOG2E; gradient terms that need the TRUE A multiply the
# scaled operand back by _LN2.
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453

# With bf16 io streams the fwd state checkpoints (hck — the dominant HBM
# stream of training, 943MB/call at stage-1) and the bwd per-step stashes
# (hloc/dhp, the dominant VMEM streams of the bwd chunk loop) are stored
# bf16. The recurrences themselves (h fwd, dh bwd) stay fp32 — only the
# saved copies consumed by bulk gradient PRODUCTS are rounded, so the error
# is one rounding per product term (the bf16-matmul error class), not
# compounding. fp32 io keeps fp32 state everywhere: the kernel-parity tests
# pin fp32 grads at 2e-4 and stay exact.
#
# DELIBERATE DEVIATION from the reference kernel: the CUDA bwd saves its
# per-chunk scan states in fp32 even for bf16 inputs
# (`selective_scan.cpp:225-228` allocates `x` as float), so bf16-training
# gradients here carry one extra bf16 rounding per product term (A/B'd
# <1e-2, inside test_pallas_scan_g's bf16 5e-2 envelope). When debugging
# training parity against the reference, start from fp32 state:
# SIGMA_BF16_STATE=0. Read ONCE at import (jit caches bake the value in;
# flipping a mutable global after tracing would silently keep the stale
# precision).
_BF16_STATE = os.environ.get("SIGMA_BF16_STATE", "1") != "0"

# Bulk gradient-product precision in the hoisted bwd chunk pass (only
# active when the stash dtype is bf16, i.e. bf16 io + _BF16_STATE):
#   0 — fp32 products (r4 behavior)
#   1 — bf16 product operands, fp32 reduction accumulators
#   2 — additionally run the h/dh recurrences on the bf16 a-factor
# Read once at import (jit caches bake it in), like SIGMA_BF16_STATE.
_BF16_PROD = int(os.environ.get("SIGMA_BF16_PROD", "0"))


def _state_dtype(io_dtype):
    if _BF16_STATE and io_dtype == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


def _unroll_for(g: int, dg: int, n_state: int) -> int:
    # the bwd state stash is (U, G, N, dg): halve U when the state is wide
    # so the fixed VMEM cost doesn't crush the block size
    state = 4 * g * n_state * dg
    return _UNROLL if state <= 192 * 1024 else 8


def _ck_tokens(g: int, dg: int, n_state: int, T: int) -> int:
    """Checkpoint interval in tokens: _CK_RATIO bwd chunks, shrunk to a
    power-of-two divisor of T."""
    ck = _CK_RATIO * _unroll_for(g, dg, n_state)
    while ck > 8 and T % ck:
        ck //= 2
    return min(ck, T)


def _hoist_for(g: int, dg: int, n_state: int, unroll: int) -> bool:
    # hoisting exp(d*A) and du*B materializes two (U, G, N, dg) values;
    # only worth it while they fit comfortably next to the blocks
    return unroll * 4 * g * n_state * dg <= 2 * 1024 * 1024


def _unroll_fwd(g: int, dg: int, n_state: int, T: int) -> int:
    # fwd-only: large unrolls with INLINE exp/du*B measured fastest
    # (U=64 no-hoist 7.1ms vs U=16 hoisted 8.7ms at stage-1 shapes —
    # hoist-buffer VMEM round-trips cost more than they save); the fwd
    # kernel has no U-sized stash, so U is bounded only by T
    u = 64
    while u > 8 and (T % u or u * 4 * g * n_state * dg > 8 * 1024 * 1024):
        u //= 2
    return u


def _pair_swap(v):
    """Swap adjacent chain pairs on axis 0: (2k, 2k+1) -> (2k+1, 2k).
    Implements CroMB's cross-modal C exchange (vmamba.py:1528-1539) inside
    the kernel — each modality's scan consumes the OTHER modality's
    projected C. Valid when chains are (fold x modality-pair) ordered."""
    sh = v.shape
    r = v.reshape((sh[0] // 2, 2) + sh[1:])
    # slice+concat instead of ::-1 (Mosaic has no `rev` lowering)
    r = jnp.concatenate([r[:, 1:2], r[:, 0:1]], axis=1)
    return r.reshape(sh)


def _d_eff_blk(d_blk, bias_ref, softplus, has_bias):
    if has_bias:
        d_blk = d_blk + bias_ref[...][:, None, :]
    if softplus:
        d_blk = jax.nn.softplus(d_blk)
    return d_blk


def _fwd_kernel(u_ref, d_ref, a_ref, b_ref, c_ref, bias_ref, dk_ref,
                *refs,
                T, unroll, hoist, softplus, has_bias, has_d,
                reverse=False, with_hck=True, proj=False, ck_every=None,
                swap_c=False, accum=False, n_u=1):
    # accum: extra input block(s) (same spec as y) are ADDED into the
    # output — the reversed direction-group call folds the forward group's
    # y in-kernel, so the XLA-side direction-pair add (a full extra
    # read+read+write of y-sized HBM traffic per SS2D) never runs.
    # n_u > 1 (proj only): the chains arrive as n_u SEPARATE physical
    # layout operands of (1, fold, T, dg) blocks — e.g. SS2D's row-major
    # and transposed sequences — stacked pair-adjacent in VMEM ((fold, j)
    # chain order, identical to the batch-fold order, so weights/hck/swap_c
    # semantics are unchanged). y is likewise emitted per layout: the XLA
    # u-stack copy (+ its layout fixup) and the y split never exist in HBM.
    u_extra = ()
    if n_u > 1:
        assert proj
        u_extra, refs = refs[: n_u - 1], refs[n_u - 1 :]
    yin_refs = ()
    if accum:
        yin_refs, refs = refs[:n_u], refs[n_u:]
    y_refs, refs = refs[:n_u], refs[n_u:]
    y_ref = y_refs[0]
    if proj:
        # fused-projection mode: d_ref/b_ref/c_ref are the PROJECTION
        # WEIGHTS (G,dg,dg), (G,dg,N), (G,dg,N); dt/B/C are computed on the
        # MXU per grid block and never round-trip HBM (their streamed
        # tensors cost ~550MB of writes+reads per stage-1 SS2D call)
        if with_hck:
            hck_ref, h_scr, d_scr, b_scr, c_scr = refs
        else:
            h_scr, d_scr, b_scr, c_scr = refs
    elif with_hck:
        hck_ref, h_scr = refs
    else:
        (h_scr,) = refs
    il = pl.program_id(2)  # grid is (batch, dg-tile, L-block)

    @pl.when(il == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    A = a_ref[...]  # (G, N, dg)
    nch = T // unroll
    # reversed scans walk tokens last-to-first WITHIN the physically-laid-out
    # block (the grid index maps already deliver blocks last-to-first), so
    # no flipped copy of the sequence is ever materialized
    ks = list(reversed(range(unroll))) if reverse else list(range(unroll))

    u_refs = (u_ref,) + u_extra
    if proj:
        G = A.shape[0]
        for g in range(G):
            if n_u > 1:
                # chains are (fold, j) pair-adjacent over the layout
                # operands: chain g reads operand g % n_u, fold g // n_u
                ug = u_refs[g % n_u][0, g // n_u]
            else:
                ug = u_ref[0, g]
            d_scr[g] = jax.lax.dot_general(
                ug, d_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            b_scr[g] = jax.lax.dot_general(
                ug, b_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            c_scr[g] = jax.lax.dot_general(
                ug, c_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def body(i, h):  # h: (G, N, dg)
        t0 = (nch - 1 - i if reverse else i) * unroll
        if proj:
            d_raw = d_scr[:, pl.ds(t0, unroll), :]
            b_blk = b_scr[:, pl.ds(t0, unroll), :]
            c_blk = c_scr[:, pl.ds(t0, unroll), :]
            if swap_c:
                c_blk = _pair_swap(c_blk)
        else:
            d_raw = d_ref[0, :, pl.ds(t0, unroll), :].astype(jnp.float32)
            b_blk = b_ref[0, :, pl.ds(t0, unroll), :].astype(jnp.float32)
            c_blk = c_ref[0, :, pl.ds(t0, unroll), :].astype(jnp.float32)
        d_blk = _d_eff_blk(d_raw, bias_ref, softplus, has_bias)  # (G, U, dg)
        if n_u > 1:
            # stack the SMALL per-operand (fold, U, dg) slices into the
            # (fold, j) pair-adjacent chain order (pl.ds reads from refs)
            parts = [
                r[0, :, pl.ds(t0, unroll), :] for r in u_refs
            ]
            g_all = A.shape[0]
            u_blk = jnp.stack(parts, axis=1).reshape(
                g_all, unroll, parts[0].shape[-1]
            ).astype(jnp.float32)
        else:
            u_blk = u_ref[0, :, pl.ds(t0, unroll), :].astype(jnp.float32)
        du_blk = d_blk * u_blk
        # one transpose per block -> static width-1 lane slices per step
        c_t = jnp.swapaxes(c_blk, 1, 2)              # (G, N, U)
        if hoist:
            # hoist exp(d*A) AND the du*B outer product off the sequential
            # chain (both vectorized over U): the per-step dependent work
            # shrinks to one FMA + the y reduce. (Deferring the y reduce
            # to a bulk per-block pass was measured SLOWER — storing h
            # every step costs more than the in-step reduce saves.)
            a_blk = jnp.exp2(d_blk[:, :, None, :] * A[:, None, :, :])
            dub_blk = du_blk[:, :, None, :] * b_blk[:, :, :, None]
        else:
            b_t = jnp.swapaxes(b_blk, 1, 2)          # (G, N, U)
        ys = [None] * unroll
        for idx, k in enumerate(ks):
            if with_hck and idx % ck_every == 0:
                # per-(bwd-)chunk state checkpoint at the LOGICAL step
                # i*unroll+idx: the bwd kernel reads these instead of
                # re-running the whole forward chain — halves its
                # in-kernel recompute for ~0.4ms/call of HBM traffic
                hck_ref[0, 0, i * (unroll // ck_every) + idx // ck_every] = (
                    h.astype(hck_ref.dtype))
            ct = c_t[:, :, k : k + 1]
            if hoist:
                h = a_blk[:, k] * h + dub_blk[:, k]
            else:
                du = du_blk[:, k, :][:, None, :]
                a_t = jnp.exp2(d_blk[:, k, :][:, None, :] * A)
                h = a_t * h + du * b_t[:, :, k : k + 1]
            ys[k] = jnp.sum(ct * h, axis=1)          # (G, dg)
        y_blk = jnp.stack(ys, axis=1)                # (G, U, dg)
        if has_d:
            y_blk = y_blk + dk_ref[...][:, None, :] * u_blk
        if n_u > 1:
            # un-interleave the (fold, j) chains back onto per-layout outs
            g_all, _, dgb = y_blk.shape
            y_pair = y_blk.reshape(g_all // n_u, n_u, unroll, dgb)
            for j in range(n_u):
                yj = y_pair[:, j]
                if accum:
                    yj = yj + yin_refs[j][
                        0, :, pl.ds(t0, unroll), :
                    ].astype(jnp.float32)
                y_refs[j][0, :, pl.ds(t0, unroll), :] = yj.astype(
                    y_refs[j].dtype
                )
        else:
            if accum:
                y_blk = y_blk + yin_refs[0][
                    0, :, pl.ds(t0, unroll), :
                ].astype(jnp.float32)
            y_ref[0, :, pl.ds(t0, unroll), :] = y_blk.astype(y_ref.dtype)
        return h

    h = jax.lax.fori_loop(0, nch, body, h_scr[...])
    h_scr[...] = h


def _bwd_kernel(u_ref, d_ref, a_ref, b_ref, c_ref, bias_ref, dk_ref,
                hck_ref, dy_ref,
                *refs,
                T, unroll, hoist, softplus, has_bias, has_d,
                reverse=False, proj=False, ck_ratio=1, swap_c=False,
                n_u=1):
    # n_u > 1 (proj only): u/dy arrive as n_u per-layout operands and du
    # is emitted per layout, mirroring the fwd kernel — the XLA-side
    # stack of u/dy and the du split (each a y-sized HBM pass + layout
    # fixup per SS2D bwd) never exist. Chains stay (fold, j)
    # pair-adjacent, so hck/weights/swap_c are unchanged.
    u_extra = dy_extra = ()
    if n_u > 1:
        assert proj
        u_extra = refs[: n_u - 1]
        dy_extra = refs[n_u - 1 : 2 * (n_u - 1)]
        refs = refs[2 * (n_u - 1) :]
    u_refs = (u_ref,) + u_extra
    dy_refs = (dy_ref,) + dy_extra
    if proj:
        # fused-projection bwd: d_ref/b_ref/c_ref are PROJECTION WEIGHTS
        # (G,dg,dg)/(G,dg,N)/(G,dg,N). dt/B/C streams are recomputed on the
        # MXU per block; their cotangents are consumed in-kernel too — the
        # weight grads (dwdt/dwb/dwc) accumulate into revisited per-batch
        # output blocks and the dd/dB/dC->du chain runs as MXU dots, so
        # NONE of the (B,G,L,*) projection streams or their cotangents ever
        # touch HBM (they cost ~1.1GB of traffic per stage-1 SS2D bwd when
        # staged through XLA einsums).
        du_refs = tuple(refs[:n_u])
        du_ref = du_refs[0]
        (dA_ref, dwdt_ref, dwb_ref, dwc_ref, dbias_ref, dD_ref,
         dh_scr, dA_scr, dbias_scr, dD_scr, hloc_scr,
         d_scr, b_scr, c_scr, dd_scr, db_scr, dc_scr, *rest) = refs[n_u:]
    else:
        (du_ref, dd_ref, dA_ref, dB_ref, dC_ref, dbias_ref, dD_ref,
         dh_scr, dA_scr, dbias_scr, dD_scr, hloc_scr, *rest) = refs
    dhp_scr = rest[0] if rest else None  # hoisted path's dh-chain stash
    j = pl.program_id(2)  # logical-reversed block sweep (via index maps)

    def _chains_blk(retrieve_refs, t0):
        """(G, U, dg) block in (fold, j) pair-adjacent chain order from
        the per-layout operand refs (n_u == 1: plain block read)."""
        if n_u == 1:
            return retrieve_refs[0][
                0, :, pl.ds(t0, unroll), :
            ].astype(jnp.float32)
        parts = [r[0, :, pl.ds(t0, unroll), :] for r in retrieve_refs]
        g_all = a_ref.shape[0]
        return jnp.stack(parts, axis=1).reshape(
            g_all, unroll, parts[0].shape[-1]
        ).astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dA_scr[...] = jnp.zeros_like(dA_scr)
        dbias_scr[...] = jnp.zeros_like(dbias_scr)
        dD_scr[...] = jnp.zeros_like(dD_scr)
        if proj:
            dwdt_ref[...] = jnp.zeros_like(dwdt_ref)
            dwb_ref[...] = jnp.zeros_like(dwb_ref)
            dwc_ref[...] = jnp.zeros_like(dwc_ref)

    def _chain_u(g):
        # chain g's (T, dg) input: operand g % n_u, fold g // n_u
        if n_u == 1:
            return u_ref[0, g]
        return u_refs[g % n_u][0, g // n_u]

    if proj:
        G = a_ref.shape[0]
        for g in range(G):
            ug = _chain_u(g)
            d_scr[g] = jax.lax.dot_general(
                ug, d_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            b_scr[g] = jax.lax.dot_general(
                ug, b_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            c_scr[g] = jax.lax.dot_general(
                ug, c_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    A = a_ref[...]          # (G, N, dg), pre-scaled by log2(e)
    A_ln = A * _LN2         # the TRUE (unscaled) A, for gradient terms
    nch = T // unroll
    # logical within-chunk token order (physical slots stay the index)
    ks = list(reversed(range(unroll))) if reverse else list(range(unroll))

    def pchunk(lc):  # logical chunk -> physical chunk
        return nch - 1 - lc if reverse else lc

    def ld_dbc(t0):
        if proj:
            c_blk = c_scr[:, pl.ds(t0, unroll), :]
            if swap_c:
                c_blk = _pair_swap(c_blk)
            return (d_scr[:, pl.ds(t0, unroll), :],
                    b_scr[:, pl.ds(t0, unroll), :],
                    c_blk)
        return (d_ref[0, :, pl.ds(t0, unroll), :].astype(jnp.float32),
                b_ref[0, :, pl.ds(t0, unroll), :].astype(jnp.float32),
                c_ref[0, :, pl.ds(t0, unroll), :].astype(jnp.float32))

    def bwd_body(i, dh):  # dh: (G, N, dg)
        lc = nch - 1 - i
        t0 = pchunk(lc) * unroll
        d_raw, b_blk, c_blk = ld_dbc(t0)
        d_blk = _d_eff_blk(d_raw, bias_ref, softplus, has_bias)
        u_blk = _chains_blk(u_refs, t0)
        dy_blk = _chains_blk(dy_refs, t0)
        du_blk = d_blk * u_blk
        b_t = jnp.swapaxes(b_blk, 1, 2)              # (G, N, U)
        c_t = jnp.swapaxes(c_blk, 1, 2)
        # carry INTO logical chunk lc: checkpoints land every ck_ratio
        # chunks, so recompute the (at most ck_ratio-1 sub-chunk) gap
        if ck_ratio == 1:
            h = hck_ref[0, 0, lc].astype(jnp.float32)
        else:
            base = (lc // ck_ratio) * ck_ratio
            h0 = hck_ref[0, 0, lc // ck_ratio].astype(jnp.float32)

            def pre_body(pj, hh):
                tp = pchunk(base + pj) * unroll
                d_raw_p, b_p, _ = ld_dbc(tp)
                d_p = _d_eff_blk(d_raw_p, bias_ref, softplus, has_bias)
                u_p = _chains_blk(u_refs, tp)
                du_p = d_p * u_p
                b_tp = jnp.swapaxes(b_p, 1, 2)
                for k in ks:
                    a_t = jnp.exp2(d_p[:, k, :][:, None, :] * A)
                    hh = a_t * hh + (
                        du_p[:, k, :][:, None, :] * b_tp[:, :, k : k + 1]
                    )
                return hh

            h = jax.lax.fori_loop(0, lc - base, pre_body, h0)
        if hoist:
            # (U, G, *, dg) layouts throughout: the sequential loops slice
            # the LEADING dim (clean Mosaic layouts) and every gradient
            # product runs as ONE (U, G, N, dg) tensor op instead of U
            # small per-step ops — only the two genuinely sequential
            # recurrences (h fwd, dh bwd) stay in loops, at 1 FMA each
            #
            # pd: the bulk-product dtype. With bf16 stashes (_BF16_STATE
            # on a bf16 stream) the (U, G, N, dg) product operands are
            # kept bf16 too — the product passes are VMEM-bandwidth-bound
            # and halve their traffic; reductions still accumulate fp32.
            # _BF16_PROD=2 additionally runs the two recurrences on the
            # bf16 a-factor (one more rounding in the recomputed h chain).
            # (ahp/h_t stashed from the loop registers instead of h_prev
            # was tried: −0.8ms on the stage-1 ml micro-bench but −2% on
            # the full train step — the extra in-loop store traffic hurts
            # the other shapes more than the removed bulk passes save.)
            pd = hloc_scr.dtype if _BF16_PROD else jnp.float32
            d_u = jnp.swapaxes(d_blk, 0, 1)          # (U, G, dg)
            b_u = jnp.swapaxes(b_blk, 0, 1)          # (U, G, N)
            a_blk = jnp.exp2(d_u[:, :, None, :] * A[None])  # (U, G, N, dg)
            a_rec = a_blk.astype(pd) if _BF16_PROD >= 2 else a_blk
            a_pd = a_rec if _BF16_PROD >= 2 else a_blk.astype(pd)
            dub_blk = (
                jnp.swapaxes(du_blk, 0, 1)[:, :, None, :]
                * b_u[:, :, :, None]
            ).astype(pd)
            cdy_blk = (
                jnp.swapaxes(dy_blk, 0, 1)[:, :, None, :]
                * jnp.swapaxes(c_blk, 0, 1)[:, :, :, None]
            ).astype(pd)
            for k in ks:
                hloc_scr[k] = h.astype(hloc_scr.dtype)
                h = a_rec[k] * h + dub_blk[k]
            # dh chain: dhp[k] = dh_in + C_k dy_k ; dh_out = a_k * dhp[k]
            for k in reversed(ks):
                dhp = dh + cdy_blk[k]
                dhp_scr[k] = dhp.astype(dhp_scr.dtype)
                dh = a_rec[k] * dhp
            dhp_all = dhp_scr[...]                   # (U, G, N, dg)
            hloc_all = hloc_scr[...]
            ahp = a_pd * hloc_all.astype(pd)
            h_t = ahp + dub_blk
            dy_u = jnp.swapaxes(dy_blk, 0, 1)[:, :, None, :].astype(pd)
            du_u = jnp.swapaxes(du_blk, 0, 1)[:, :, None, :].astype(pd)
            b_pd = b_u[:, :, :, None].astype(pd)
            # shared-factor algebra: du needs sum_N(dhp*dt*B) and ddelta
            # needs sum_N(dhp*(A*ahp + B*u)) — dt and u are N-independent,
            # so ONE reduce s1 = sum_N(dhp*B) feeds both (saves two full
            # (U,G,N,dg) products + one reduce per chunk vs the naive form)
            s1 = jnp.sum(
                (dhp_all.astype(pd) * b_pd).astype(jnp.float32), axis=2
            )                                        # (U, G, dg) fp32
            dus_u = d_u * s1
            p = dhp_all.astype(pd) * ahp
            dds_u = jnp.sum((A_ln.astype(pd) * p).astype(jnp.float32),
                            axis=2) \
                + jnp.swapaxes(u_blk, 0, 1) * s1
            dA_acc = jnp.sum(
                (p * d_u[:, :, None, :].astype(pd)).astype(jnp.float32),
                axis=0,
            )
            dbs_u = jnp.sum(
                (dhp_all.astype(pd) * du_u).astype(jnp.float32), axis=3
            )                                        # (U, G, N)
            dcs_u = jnp.sum((h_t * dy_u).astype(jnp.float32), axis=3)
            du_blk_g = jnp.swapaxes(dus_u, 0, 1)               # (G, U, dg)
            dd_eff = jnp.swapaxes(dds_u, 0, 1)
            dbs_g = jnp.swapaxes(dbs_u, 0, 1)                  # (G, U, N)
            dcs_g = jnp.swapaxes(dcs_u, 0, 1)
        else:
            for k in ks:
                hloc_scr[k] = h.astype(hloc_scr.dtype)
                du = du_blk[:, k, :][:, None, :]
                a_t = jnp.exp2(d_blk[:, k, :][:, None, :] * A)
                h = a_t * h + du * b_t[:, :, k : k + 1]
            dA_acc = jnp.zeros_like(dA_scr[...])
            dus = [None] * unroll
            dds = [None] * unroll
            dbs = [None] * unroll
            dcs = [None] * unroll
            for k in reversed(ks):
                dt = d_blk[:, k, :][:, None, :]
                du = du_blk[:, k, :][:, None, :]
                dyt = dy_blk[:, k, :][:, None, :]
                h_prev = hloc_scr[k]                 # (G, N, dg)
                ut = u_blk[:, k, :][:, None, :]
                bt = b_t[:, :, k : k + 1]
                ct = c_t[:, :, k : k + 1]
                a_t = jnp.exp2(dt * A)
                ahp = a_t * h_prev
                h_t = ahp + du * bt
                dh = dh + ct * dyt
                dus[k] = jnp.sum(dh * dt * bt, axis=1)           # (G, dg)
                dds[k] = jnp.sum(dh * (A_ln * ahp + bt * ut), axis=1)
                dA_acc = dA_acc + dh * ahp * dt
                dbs[k] = jnp.sum(dh * du, axis=2)                # (G, N)
                dcs[k] = jnp.sum(h_t * dyt, axis=2)
                dh = dh * a_t
            du_blk_g = jnp.stack(dus, axis=1)        # (G, U, dg)
            dd_eff = jnp.stack(dds, axis=1)
            dbs_g = jnp.stack(dbs, axis=1)           # (G, U, N)
            dcs_g = jnp.stack(dcs, axis=1)
        if has_d:
            dk = dk_ref[...][:, None, :]
            du_blk_g = du_blk_g + dy_blk * dk
            dD_scr[...] = dD_scr[...] + jnp.sum(dy_blk * u_blk, axis=1)
        if softplus:
            # adjoint of softplus(d_raw + bias): sigmoid jacobian
            # (reference bwd kernel re-loads it the same way,
            # selective_scan_bwd_kernel.cuh:234-247)
            pre = d_raw + bias_ref[...][:, None, :] if has_bias else d_raw
            dd_raw = dd_eff * jax.nn.sigmoid(pre)
        else:
            dd_raw = dd_eff
        if has_bias:
            dbias_scr[...] = dbias_scr[...] + jnp.sum(dd_raw, axis=1)
        if n_u > 1:
            g_all, _, dgb = du_blk_g.shape
            du_pair = du_blk_g.reshape(g_all // n_u, n_u, unroll, dgb)
            for jj in range(n_u):
                du_refs[jj][0, :, pl.ds(t0, unroll), :] = du_pair[
                    :, jj
                ].astype(du_refs[jj].dtype)
        else:
            du_ref[0, :, pl.ds(t0, unroll), :] = du_blk_g.astype(
                du_ref.dtype
            )
        if proj:
            dd_scr[:, pl.ds(t0, unroll), :] = dd_raw
            db_scr[:, pl.ds(t0, unroll), :] = dbs_g
            # dcs_g is the cotangent of the C each CHAIN consumed; under
            # the swap it belongs to the PARTNER chain's projection
            dc_scr[:, pl.ds(t0, unroll), :] = (
                _pair_swap(dcs_g) if swap_c else dcs_g)
        else:
            dd_ref[0, :, pl.ds(t0, unroll), :] = dd_raw.astype(dd_ref.dtype)
            # dB/dC blocks carry a leading per-dg-tile axis (partials are
            # summed over tiles in XLA)
            dB_ref[0, 0, :, pl.ds(t0, unroll), :] = \
                dbs_g.astype(dB_ref.dtype)
            dC_ref[0, 0, :, pl.ds(t0, unroll), :] = \
                dcs_g.astype(dC_ref.dtype)
        dA_scr[...] = dA_scr[...] + dA_acc
        return dh

    dh = jax.lax.fori_loop(0, T // unroll, bwd_body, dh_scr[...])
    dh_scr[...] = dh

    if proj:
        # weight-grad accumulation + the dd/dB/dC -> du chain, both as MXU
        # dots over the full T block (operands in io dtype, f32 accumulate
        # — the MXU's native mode for bf16 streams)
        io = u_ref.dtype
        for g in range(a_ref.shape[0]):
            u_g = _chain_u(g)                        # (T, dg) io
            dd_g = dd_scr[g].astype(io)              # (T, dg)
            db_g = db_scr[g].astype(io)              # (T, N)
            dc_g = dc_scr[g].astype(io)
            ct = (((0,), (0,)), ((), ()))            # contract over T
            dwdt_ref[0, g] += jax.lax.dot_general(
                u_g, dd_g, ct, preferred_element_type=jnp.float32)
            dwb_ref[0, g] += jax.lax.dot_general(
                u_g, db_g, ct, preferred_element_type=jnp.float32)
            dwc_ref[0, g] += jax.lax.dot_general(
                u_g, dc_g, ct, preferred_element_type=jnp.float32)
            cm = (((1,), (1,)), ((), ()))            # contract minor dims
            chain = jax.lax.dot_general(
                dd_g, d_ref[g], cm, preferred_element_type=jnp.float32)
            chain = chain + jax.lax.dot_general(
                db_g, b_ref[g], cm, preferred_element_type=jnp.float32)
            chain = chain + jax.lax.dot_general(
                dc_g, c_ref[g], cm, preferred_element_type=jnp.float32)
            dref = du_refs[g % n_u] if n_u > 1 else du_ref
            gi = g // n_u if n_u > 1 else g
            dref[0, gi] = (
                dref[0, gi].astype(jnp.float32) + chain
            ).astype(dref.dtype)
    # dA_scr accumulated dh*ahp*dt; the cotangent w.r.t. the SCALED operand
    # a2 = A*log2e is that times ln2 (wrapper autodiff multiplies back by
    # log2e, recovering the true dA)
    dA_ref[0] = dA_scr[...] * _LN2
    dbias_ref[0] = dbias_scr[...]
    dD_ref[0] = dD_scr[...]


def _block_t(g: int, dg: int, n_state: int, want: int, L: int,
             proj: bool = False, sb: int = 4) -> int:
    """Pick T: sized for the bwd VMEM budget, preferring divisors of L so
    no L-padding pass is needed. `sb` is the state-stash byte width
    (2 when _BF16_STATE rides a bf16 io stream): the hloc/dhp stashes and
    the per-T hck blocks shrink with it, unlocking larger blocks."""
    state = 4 * g * n_state * dg       # one (G, N, dg) fp32 value
    state_sb = sb * g * n_state * dg   # one stash-dtype value
    u = _unroll_for(g, dg, n_state)
    hoist = _hoist_for(g, dg, n_state, u)
    # hoisted (U, G, N, dg) values: a/dub/cdy blocks and bulk-phase
    # temporaries (ahp, h_t, dtb, btu) are fp32; the dhp stash is sb
    a_fix = u * (7 * state + state_sb) if hoist else 0
    # dh/dA/dbias/dD carries (fp32) + hloc stash (sb) + hoisted + slack
    fixed = 2 * state + u * state_sb + a_fix + 6 * 1024 * 1024
    # per-T streams incl. the double-buffered per-chunk hck input blocks
    # (hck is stored in the stash dtype)
    per_t = 2 * 4 * g * (5 * dg + 4 * n_state) + 2 * state_sb // u
    if proj:
        # proj bwd: in-VMEM dt/dd (G,T,dg) f32 + B/C/dB/dC (G,T,N) f32
        # streams, plus the weights and per-batch weight-grad out blocks
        fixed += 6 * g * dg * dg + 12 * g * dg * n_state
        per_t += 4 * g * (2 * dg + 4 * n_state)
    # only ~half the limit goes to kernel blocks/scratch: XLA additionally
    # stages custom-call operands/results in VMEM under the raised cap
    budget = _VMEM_LIMIT // 2 - fixed
    tmax = max(u, min(want, budget // max(per_t, 1)))
    tmax -= tmax % u
    tmax = max(tmax, u)
    # prefer multiples of 64 dividing L: the fwd kernel's unroll is the
    # largest power of two dividing T (64 measured fastest), and T=128
    # measured best overall at stage-1 shapes (bwd is T-insensitive)
    for t in range(tmax - tmax % 64, 63, -64):
        if L % t == 0:
            return t
    for t in range(tmax, u - 1, -u):
        if L % t == 0:
            return t
    return tmax


def _pallas_params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _plan_g_layout(batch, G, N, dg, L, want, fold_batch, sb=4):
    """Choose (fold, dgt, T) for the streamed grouped kernel.

    The recurrence is independent per dg channel, so wide shapes split dg
    across a grid dim (each tile scans with its own small (G,N,dgt) state)
    instead of letting T collapse — the round-2 behavior for sigma_base
    stage 4 (G=2, N=16, dg=2048 folded to 1MB state => T=8). Score is
    lexicographic: padding-discounted block length capped at the measured
    T=128 sweet spot, then ILP chains, then tile width (fewer tiles =
    fewer B/C re-reads). Returns None when no candidate fits VMEM (caller
    falls back to the per-row kernel).
    """
    tiles = [dg] + [t for t in (1024, 896, 768, 640, 512, 384, 256, 128)
                    if t < dg and dg % t == 0]
    if fold_batch and batch > 1 and G < 8:
        folds = [c for c in range(min(batch, 8 // G), 0, -1)
                 if batch % c == 0]
    else:
        folds = [1]
    best = None
    for dgt in tiles:
        for cand in folds:
            eff_g = cand * G
            if 4 * eff_g * N * dgt > 1024 * 1024:
                continue
            T = _block_t(eff_g, dgt, N, want, L, sb=sb)
            eff_t = min(T, 128) * L / (L + (-L) % T)
            key = (eff_t, eff_g, dgt)
            if best is None or key > best[0]:
                best = (key, cand, dgt, T)
    if best is None:
        return None
    return best[1], best[2], best[3]


def _fwd_call(u, d, a3, b, c, bias, dk, T, flags, interpret, reverse=False,
              with_hck=True, proj=False, dgt=None, y_accum=None):
    """proj=False: d/b/c are streamed (B,G,L,dg)/(B,G,L,N) tensors.
    proj=True:  d/b/c are projection weights (G,dg,dg)/(G,dg,N)/(G,dg,N)
    and dt/B/C are computed on the MXU inside the kernel.
    dgt: dg tile width — the recurrence is independent per dg channel, so
    wide shapes split dg across the middle grid dim (never with proj).
    y_accum: optional (B,G,L,dg) tensor ADDED into y inside the kernel."""
    batch, G, L, dg = u.shape
    N = a3.shape[1]
    nl = L // T
    dgt = dg if dgt is None else dgt
    ndg = dg // dgt
    grid = (batch, ndg, nl)
    un = _unroll_fwd(G, dgt, N, T)
    ck = None
    if with_hck:
        # checkpoints land every _CK_RATIO bwd chunks (the bwd kernel
        # recomputes the gap); keep the fwd unroll a multiple of ck (all
        # powers of two dividing T)
        ck = _ck_tokens(G, dgt, N, T)
        un = max(un, ck)
    kernel = functools.partial(
        _fwd_kernel, T=T, unroll=un, hoist=False,
        reverse=reverse, with_hck=with_hck, proj=proj, ck_every=ck,
        accum=y_accum is not None, **flags
    )

    # reversed scans stream physical blocks last-to-first; y still lands at
    # the physical block, and hck stays indexed by LOGICAL block
    def blk(b_, k, j):
        return (b_, 0, nl - 1 - j, k) if reverse else (b_, 0, j, k)

    def blk_n(b_, k, j):  # B/C: no dg axis, re-streamed per dg tile
        return (b_, 0, nl - 1 - j, 0) if reverse else (b_, 0, j, 0)

    out_specs = [pl.BlockSpec((1, G, T, dgt), blk, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((batch, G, L, dg), u.dtype)]
    if with_hck:
        # per-(bwd-)chunk state checkpoints, consumed by the bwd kernel;
        # the inference path skips this output entirely (pure HBM write
        # traffic there)
        nck = T // ck
        out_specs.append(
            pl.BlockSpec((1, 1, nck, G, N, dgt),
                         lambda b_, k, j: (b_, j, 0, 0, 0, k),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (batch, nl, nck, G, N, dg), _state_dtype(u.dtype)
            )
        )
    if proj:
        assert ndg == 1  # projections contract over full dg
        dbc_specs = [
            pl.BlockSpec((G, dg, dg), lambda b_, k, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, dg, N), lambda b_, k, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, dg, N), lambda b_, k, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        extra_scratch = [
            pltpu.VMEM((G, T, dg), jnp.float32),  # dt block
            pltpu.VMEM((G, T, N), jnp.float32),   # B block
            pltpu.VMEM((G, T, N), jnp.float32),   # C block
        ]
    else:
        dbc_specs = [
            pl.BlockSpec((1, G, T, dgt), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), blk_n, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), blk_n, memory_space=pltpu.VMEM),
        ]
        extra_scratch = []
    in_specs = [
        pl.BlockSpec((1, G, T, dgt), blk, memory_space=pltpu.VMEM),
        dbc_specs[0],
        pl.BlockSpec((G, N, dgt), lambda b_, k, j: (0, 0, k),
                     memory_space=pltpu.VMEM),
        dbc_specs[1],
        dbc_specs[2],
        pl.BlockSpec((G, dgt), lambda b_, k, j: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, dgt), lambda b_, k, j: (0, k),
                     memory_space=pltpu.VMEM),
    ]
    operands = [u, d, a3, b, c, bias, dk]
    if y_accum is not None:
        in_specs.append(
            pl.BlockSpec((1, G, T, dgt), blk, memory_space=pltpu.VMEM)
        )
        operands.append(y_accum)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((G, N, dgt), jnp.float32)] + extra_scratch,
        cost_estimate=pl.CostEstimate(
            flops=9 * batch * G * L * dg * N,
            bytes_accessed=4 * batch * G * L * (3 * dg + 2 * N),
            transcendentals=batch * G * L * dg * N,
        ),
        compiler_params=_pallas_params(interpret),
        interpret=interpret,
    )(*operands)
    return (out[0], out[1]) if with_hck else (out[0], None)


def _fwd_call_ml(us, wdt, a3, wb, wc, bias, dk, T, flags, interpret,
                 reverse=False, with_hck=True, y_accs=None):
    """Multi-layout fused-projection call: `us` is a tuple of n_u operands,
    each (B, fold, L, dg) — one per PHYSICAL layout of the input (e.g.
    SS2D's row-major and transposed sequences). Chains are stacked
    (fold, j) pair-adjacent IN VMEM, matching the batch-fold chain order of
    the stacked path, so wdt/a3/bias/dk arrive (fold*n_u, ...)-tiled
    exactly as in `_fwd_call` and hck/swap_c semantics are unchanged.
    y is emitted per layout: the XLA u-stack copy (+ its layout fixup
    pass) and the y split never exist in HBM."""
    n_u = len(us)
    batch, f, L, dg = us[0].shape
    G = f * n_u
    N = a3.shape[1]
    nl = L // T
    grid = (batch, 1, nl)
    un = _unroll_fwd(G, dg, N, T)
    ck = None
    if with_hck:
        ck = _ck_tokens(G, dg, N, T)
        un = max(un, ck)
    kernel = functools.partial(
        _fwd_kernel, T=T, unroll=un, hoist=False, reverse=reverse,
        with_hck=with_hck, proj=True, ck_every=ck,
        accum=y_accs is not None, n_u=n_u, **flags
    )

    def blk(b_, k, j):
        return (b_, 0, nl - 1 - j, k) if reverse else (b_, 0, j, k)

    def const3(b_, k, j):
        return (0, 0, 0)

    u_spec = pl.BlockSpec((1, f, T, dg), blk, memory_space=pltpu.VMEM)
    in_specs = [
        u_spec,
        pl.BlockSpec((G, dg, dg), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, N, dg), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, dg, N), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, dg, N), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, dg), lambda b_, k, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, dg), lambda b_, k, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [us[0], wdt, a3, wb, wc, bias, dk]
    for uj in us[1:]:
        in_specs.append(u_spec)
        operands.append(uj)
    if y_accs is not None:
        for ya in y_accs:
            in_specs.append(u_spec)
            operands.append(ya)
    out_specs = [u_spec for _ in range(n_u)]
    out_shape = [
        jax.ShapeDtypeStruct((batch, f, L, dg), us[0].dtype)
        for _ in range(n_u)
    ]
    if with_hck:
        nck = T // ck
        out_specs.append(
            pl.BlockSpec((1, 1, nck, G, N, dg),
                         lambda b_, k, j: (b_, j, 0, 0, 0, k),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (batch, nl, nck, G, N, dg), _state_dtype(us[0].dtype)
            )
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((G, N, dg), jnp.float32),
            pltpu.VMEM((G, T, dg), jnp.float32),  # dt block
            pltpu.VMEM((G, T, N), jnp.float32),   # B block
            pltpu.VMEM((G, T, N), jnp.float32),   # C block
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * batch * G * L * dg * N,
            bytes_accessed=4 * batch * G * L * (3 * dg + 2 * N),
            transcendentals=batch * G * L * dg * N,
        ),
        compiler_params=_pallas_params(interpret),
        interpret=interpret,
    )(*operands)
    ys = tuple(out[:n_u])
    return ys, (out[n_u] if with_hck else None)


# Per-call cap on saveable scan residuals: calls whose residual set
# exceeds this stay fully rematerialized. 300MB keeps the three ~354MB
# stage-1 sets (2 VSSBlock SS2Ds + the ConMB, sigma_tiny 480x640 b8) on
# the recompute path — saving everything overshot the v5e's 15.75G HBM
# budget by 176MB.
_SCAN_RES_MAX_BYTES = int(
    float(os.environ.get("SIGMA_SCAN_RES_MAX_MB", "300")) * (1 << 20)
)


def _name_res(res):
    """Mark scan residuals remat-saveable (checkpoint_name 'scan_res').

    Under the models' save-scan-residuals remat policy
    (sigma_tpu/models/vssm.py:remat_policy) the bwd pass reads u/weights/
    hck from HBM instead of re-running the forward scan kernel (and its
    upstream chain) inside the rematerialized block — measured ~12% of
    the train step. With the default jax.checkpoint policy the names are
    inert identities. Calls above _SCAN_RES_MAX_BYTES are left unnamed
    (recomputed) to bound the residual footprint."""
    from jax.ad_checkpoint import checkpoint_name

    from sigma_tpu.models.vssm import _SAVE_SCAN_RES

    if not _SAVE_SCAN_RES:
        # no-op unless the saving policy is active: the name_p identities
        # are not free — they pin the residual values and can block XLA
        # fusions around them
        return res
    total = sum(
        x.size * x.dtype.itemsize for x in res if x is not None
    )
    if total > _SCAN_RES_MAX_BYTES:
        return res
    return tuple(
        checkpoint_name(x, "scan_res") if x is not None else None
        for x in res
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def _scan_core_g(u, d, a3, b, c, bias, dk,
                 T, dgt, softplus, has_bias, has_d, interpret, reverse):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d)
    y, _ = _fwd_call(u, d, a3, b, c, bias, dk, T, flags, interpret, reverse,
                     with_hck=False, dgt=dgt)
    return y


def _scan_core_g_fwd(u, d, a3, b, c, bias, dk,
                     T, dgt, softplus, has_bias, has_d, interpret, reverse):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d)
    y, hck = _fwd_call(u, d, a3, b, c, bias, dk, T, flags, interpret,
                       reverse, dgt=dgt)
    return y, _name_res((u, d, a3, b, c, bias, dk, hck))


def _scan_core_g_bwd(T, dgt, softplus, has_bias, has_d, interpret, reverse,
                     res, dy):
    u, d, a3, b, c, bias, dk, hck = res
    du, dd, dA, dBt, dCt, dbias, dD = _bwd_call(
        u, d, a3, b, c, bias, dk, hck, dy,
        T, softplus, has_bias, has_d, interpret, reverse, dgt=dgt,
    )
    # cotangents must match primal operand dtypes (bf16 streams)
    return (du.astype(u.dtype), dd.astype(d.dtype), dA,
            dBt.astype(b.dtype), dCt.astype(c.dtype), dbias, dD)


def _bwd_call(u, d, a3, b, c, bias, dk, hck, dy,
              T, softplus, has_bias, has_d, interpret, reverse,
              proj=False, dgt=None, swap_c=False):
    """Shared bwd pallas_call.

    proj=False: d/b/c are streamed tensors; returns
    (du, dd, dA, dB, dC, dbias, dD) with stream cotangents in the stream
    io dtype and the rest fp32. Wide shapes tile dg (dgt) across the
    middle grid dim; dB/dC come back as per-tile partials summed here.
    proj=True: d/b/c are projection weights (G,dg,dg)/(G,dg,N)/(G,dg,N);
    returns (du, dA, dwdt, dwb, dwc, dbias, dD) — the projection streams
    and their cotangents live entirely in VMEM. Never tiled.
    """
    batch, G, L, dg = u.shape
    N = a3.shape[1]
    nl = L // T
    dgt = dg if dgt is None else dgt
    ndg = dg // dgt

    def rev(j):
        return nl - 1 - j

    un = _unroll_for(G, dgt, N)
    ck = _ck_tokens(G, dgt, N, T)
    kernel = functools.partial(
        _bwd_kernel, T=T, unroll=un, hoist=_hoist_for(G, dgt, N, un),
        softplus=softplus, has_bias=has_bias, has_d=has_d, reverse=reverse,
        proj=proj, ck_ratio=ck // un, swap_c=swap_c,
    )
    # bwd grid step j handles LOGICAL block nl-1-j; its physical block is
    # j for a reversed scan, nl-1-j for a forward one. hck is logical.
    def blk3(b_, k, j):
        return (b_, 0, j, k) if reverse else (b_, 0, rev(j), k)

    def blk3_n(b_, k, j):  # B/C blocks: no dg axis
        return (b_, 0, j, 0) if reverse else (b_, 0, rev(j), 0)

    big = pl.BlockSpec((1, G, T, dgt), blk3, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((1, G, T, N), blk3_n, memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((G, dgt), lambda b_, k, j: (0, k),
                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, G, dgt), lambda b_, k, j: (b_, 0, k),
                       memory_space=pltpu.VMEM)
    amat = pl.BlockSpec((G, N, dgt), lambda b_, k, j: (0, 0, k),
                        memory_space=pltpu.VMEM)
    hck_spec = pl.BlockSpec((1, 1, T // ck, G, N, dgt),
                            lambda b_, k, j: (b_, rev(j), 0, 0, 0, k),
                            memory_space=pltpu.VMEM)
    dA_spec = pl.BlockSpec((1, G, N, dgt), lambda b_, k, j: (b_, 0, 0, k),
                           memory_space=pltpu.VMEM)
    sdt = _state_dtype(u.dtype)  # stash precision rides the io dtype
    base_scratch = [
        pltpu.VMEM((G, N, dgt), jnp.float32),   # dh carry
        pltpu.VMEM((G, N, dgt), jnp.float32),   # dA accumulator
        pltpu.VMEM((G, dgt), jnp.float32),      # dbias accumulator
        pltpu.VMEM((G, dgt), jnp.float32),      # dD accumulator
        pltpu.VMEM((un, G, N, dgt), sdt),       # hloc stash
    ]
    # the hoisted path additionally stashes the per-step dh-chain values so
    # every gradient product runs as one bulk (U, G, N, dg) tensor op
    hoist_scratch = (
        [pltpu.VMEM((un, G, N, dgt), sdt)]
        if _hoist_for(G, dgt, N, un) else []
    )

    if proj:
        assert ndg == 1
        wdt_spec = pl.BlockSpec((G, dg, dg), lambda b_, k, j: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        wbc_spec = pl.BlockSpec((G, dg, N), lambda b_, k, j: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        du, dA_b, dwdt_b, dwb_b, dwc_b, dbias_b, dD_b = pl.pallas_call(
            kernel,
            grid=(batch, 1, nl),
            in_specs=[big, wdt_spec, amat, wbc_spec, wbc_spec, vec, vec,
                      hck_spec, big],
            out_specs=(
                big, dA_spec,
                pl.BlockSpec((1, G, dg, dg),
                             lambda b_, k, j: (b_, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, dg, N),
                             lambda b_, k, j: (b_, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, dg, N),
                             lambda b_, k, j: (b_, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                acc, acc,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((batch, G, L, dg), u.dtype),
                jax.ShapeDtypeStruct((batch, G, N, dg), jnp.float32),
                jax.ShapeDtypeStruct((batch, G, dg, dg), jnp.float32),
                jax.ShapeDtypeStruct((batch, G, dg, N), jnp.float32),
                jax.ShapeDtypeStruct((batch, G, dg, N), jnp.float32),
                jax.ShapeDtypeStruct((batch, G, dg), jnp.float32),
                jax.ShapeDtypeStruct((batch, G, dg), jnp.float32),
            ),
            scratch_shapes=base_scratch + [
                pltpu.VMEM((G, T, dg), jnp.float32),  # dt stream
                pltpu.VMEM((G, T, N), jnp.float32),   # B stream
                pltpu.VMEM((G, T, N), jnp.float32),   # C stream
                pltpu.VMEM((G, T, dg), jnp.float32),  # dd_raw
                pltpu.VMEM((G, T, N), jnp.float32),   # dB
                pltpu.VMEM((G, T, N), jnp.float32),   # dC
            ] + hoist_scratch,
            compiler_params=_pallas_params(interpret),
            interpret=interpret,
        )(u, d, a3, b, c, bias, dk, hck, dy)
        return (du, dA_b.sum(axis=0), dwdt_b.sum(axis=0),
                dwb_b.sum(axis=0), dwc_b.sum(axis=0),
                dbias_b.sum(axis=0), dD_b.sum(axis=0))

    # dB/dC are reduced over dg, so each dg tile contributes a partial:
    # emit per-tile and sum in XLA (tiny — tiling only fires on wide-dg
    # short-L shapes)
    small_t = pl.BlockSpec(
        (1, 1, G, T, N),
        lambda b_, k, j: ((b_, k, 0, j, 0) if reverse
                          else (b_, k, 0, rev(j), 0)),
        memory_space=pltpu.VMEM,
    )
    du, dd, dA_b, dBt, dCt, dbias_b, dD_b = pl.pallas_call(
        kernel,
        grid=(batch, ndg, nl),
        in_specs=[
            big, big, amat, small, small, vec, vec, hck_spec, big,
        ],
        out_specs=(
            big, big, dA_spec, small_t, small_t, acc, acc,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, G, L, dg), u.dtype),
            jax.ShapeDtypeStruct((batch, G, L, dg), d.dtype),
            jax.ShapeDtypeStruct((batch, G, N, dg), jnp.float32),
            jax.ShapeDtypeStruct((batch, ndg, G, L, N), jnp.float32),
            jax.ShapeDtypeStruct((batch, ndg, G, L, N), jnp.float32),
            jax.ShapeDtypeStruct((batch, G, dg), jnp.float32),
            jax.ShapeDtypeStruct((batch, G, dg), jnp.float32),
        ),
        scratch_shapes=base_scratch + hoist_scratch,
        compiler_params=_pallas_params(interpret),
        interpret=interpret,
    )(u, d, a3, b, c, bias, dk, hck, dy)

    dA = dA_b.sum(axis=0)                           # (G, N, dg)
    return (du, dd, dA, dBt.sum(axis=1).astype(b.dtype),
            dCt.sum(axis=1).astype(c.dtype),
            dbias_b.sum(axis=0), dD_b.sum(axis=0))


def _bwd_call_ml(us, wdt, a3, wb, wc, bias, dk, hck, dys,
                 T, softplus, has_bias, has_d, interpret, reverse,
                 swap_c=False):
    """Multi-layout proj bwd: u/dy as per-layout operands, du per layout —
    the stacked-shim u/dy stacks and the du split never exist in HBM.
    Chain/hck/weight layouts identical to the stacked proj bwd.
    Returns ((du0, du1, ...), dA, dwdt, dwb, dwc, dbias, dD)."""
    n_u = len(us)
    batch, f, L, dg = us[0].shape
    G = f * n_u
    N = a3.shape[1]
    nl = L // T

    def rev(j):
        return nl - 1 - j

    un = _unroll_for(G, dg, N)
    ck = _ck_tokens(G, dg, N, T)
    kernel = functools.partial(
        _bwd_kernel, T=T, unroll=un, hoist=_hoist_for(G, dg, N, un),
        softplus=softplus, has_bias=has_bias, has_d=has_d, reverse=reverse,
        proj=True, ck_ratio=ck // un, swap_c=swap_c, n_u=n_u,
    )

    def blk3(b_, k, j):
        return (b_, 0, j, k) if reverse else (b_, 0, rev(j), k)

    def const3(b_, k, j):
        return (0, 0, 0)

    u_spec = pl.BlockSpec((1, f, T, dg), blk3, memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((G, dg), lambda b_, k, j: (0, 0),
                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, G, dg), lambda b_, k, j: (b_, 0, 0),
                       memory_space=pltpu.VMEM)
    amat = pl.BlockSpec((G, N, dg), const3, memory_space=pltpu.VMEM)
    hck_spec = pl.BlockSpec((1, 1, T // ck, G, N, dg),
                            lambda b_, k, j: (b_, rev(j), 0, 0, 0, k),
                            memory_space=pltpu.VMEM)
    dA_spec = pl.BlockSpec((1, G, N, dg), lambda b_, k, j: (b_, 0, 0, k),
                           memory_space=pltpu.VMEM)
    wdt_spec = pl.BlockSpec((G, dg, dg), const3, memory_space=pltpu.VMEM)
    wbc_spec = pl.BlockSpec((G, dg, N), const3, memory_space=pltpu.VMEM)
    sdt = _state_dtype(us[0].dtype)  # stash precision rides the io dtype
    base_scratch = [
        pltpu.VMEM((G, N, dg), jnp.float32),   # dh carry
        pltpu.VMEM((G, N, dg), jnp.float32),   # dA accumulator
        pltpu.VMEM((G, dg), jnp.float32),      # dbias accumulator
        pltpu.VMEM((G, dg), jnp.float32),      # dD accumulator
        pltpu.VMEM((un, G, N, dg), sdt),       # hloc stash
    ]
    hoist_scratch = (
        [pltpu.VMEM((un, G, N, dg), sdt)]
        if _hoist_for(G, dg, N, un) else []
    )
    in_specs = [u_spec, wdt_spec, amat, wbc_spec, wbc_spec, vec, vec,
                hck_spec, u_spec]
    operands = [us[0], wdt, a3, wb, wc, bias, dk, hck, dys[0]]
    for uj in us[1:]:
        in_specs.append(u_spec)
        operands.append(uj)
    for dyj in dys[1:]:
        in_specs.append(u_spec)
        operands.append(dyj)
    out_specs = [u_spec for _ in range(n_u)] + [
        dA_spec,
        pl.BlockSpec((1, G, dg, dg), lambda b_, k, j: (b_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, dg, N), lambda b_, k, j: (b_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, dg, N), lambda b_, k, j: (b_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        acc, acc,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, f, L, dg), us[0].dtype)
        for _ in range(n_u)
    ] + [
        jax.ShapeDtypeStruct((batch, G, N, dg), jnp.float32),
        jax.ShapeDtypeStruct((batch, G, dg, dg), jnp.float32),
        jax.ShapeDtypeStruct((batch, G, dg, N), jnp.float32),
        jax.ShapeDtypeStruct((batch, G, dg, N), jnp.float32),
        jax.ShapeDtypeStruct((batch, G, dg), jnp.float32),
        jax.ShapeDtypeStruct((batch, G, dg), jnp.float32),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(batch, 1, nl),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=base_scratch + [
            pltpu.VMEM((G, T, dg), jnp.float32),  # dt stream
            pltpu.VMEM((G, T, N), jnp.float32),   # B stream
            pltpu.VMEM((G, T, N), jnp.float32),   # C stream
            pltpu.VMEM((G, T, dg), jnp.float32),  # dd_raw
            pltpu.VMEM((G, T, N), jnp.float32),   # dB
            pltpu.VMEM((G, T, N), jnp.float32),   # dC
        ] + hoist_scratch,
        compiler_params=_pallas_params(interpret),
        interpret=interpret,
    )(*operands)
    dus = tuple(out[:n_u])
    dA_b, dwdt_b, dwb_b, dwc_b, dbias_b, dD_b = out[n_u:]
    return (dus, dA_b.sum(axis=0), dwdt_b.sum(axis=0),
            dwb_b.sum(axis=0), dwc_b.sum(axis=0),
            dbias_b.sum(axis=0), dD_b.sum(axis=0))


_scan_core_g.defvjp(_scan_core_g_fwd, _scan_core_g_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def _scan_core_gp(u, wdt, wb, wc, a3, bias, dk,
                  T, softplus, has_bias, has_d, interpret, reverse,
                  swap_c=False):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    y, _ = _fwd_call(u, wdt, a3, wb, wc, bias, dk, T, flags, interpret,
                     reverse, with_hck=False, proj=True)
    return y


def _scan_core_gp_fwd(u, wdt, wb, wc, a3, bias, dk,
                      T, softplus, has_bias, has_d, interpret, reverse,
                      swap_c=False):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    y, hck = _fwd_call(u, wdt, a3, wb, wc, bias, dk, T, flags, interpret,
                       reverse, with_hck=True, proj=True)
    return y, _name_res((u, wdt, wb, wc, a3, bias, dk, hck))


def _scan_core_gp_bwd(T, softplus, has_bias, has_d, interpret, reverse,
                      swap_c, res, dy):
    u, wdt, wb, wc, a3, bias, dk, hck = res
    # Fully fused bwd: dt/B/C are re-projected on the MXU INSIDE the
    # kernel, and both the weight grads and the dd/dB/dC->du chain run as
    # in-kernel dots — no (B,G,L,*) projection stream or stream cotangent
    # ever touches HBM (staging them through XLA einsums cost ~1.1GB of
    # HBM traffic per stage-1 SS2D bwd).
    du, dA, dwdt, dwb, dwc, dbias, dD = _bwd_call(
        u, wdt, a3, wb, wc, bias, dk, hck, dy,
        T, softplus, has_bias, has_d, interpret, reverse, proj=True,
        swap_c=swap_c,
    )
    return (du.astype(u.dtype), dwdt.astype(wdt.dtype),
            dwb.astype(wb.dtype), dwc.astype(wc.dtype), dA, dbias, dD)


_scan_core_gp.defvjp(_scan_core_gp_fwd, _scan_core_gp_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14)
)
def _scan_core_gpa(u, wdt, wb, wc, a3, bias, dk, y_acc,
                   T, softplus, has_bias, has_d, interpret, reverse,
                   swap_c=False):
    """Proj core with in-kernel output accumulation: y = scan(u) + y_acc.
    The accumulation is linear, so bwd passes dy straight through to
    y_acc and the scan gradients are unchanged."""
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    y, _ = _fwd_call(u, wdt, a3, wb, wc, bias, dk, T, flags, interpret,
                     reverse, with_hck=False, proj=True, y_accum=y_acc)
    return y


def _scan_core_gpa_fwd(u, wdt, wb, wc, a3, bias, dk, y_acc,
                       T, softplus, has_bias, has_d, interpret, reverse,
                       swap_c=False):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    y, hck = _fwd_call(u, wdt, a3, wb, wc, bias, dk, T, flags, interpret,
                       reverse, with_hck=True, proj=True, y_accum=y_acc)
    return y, _name_res((u, wdt, wb, wc, a3, bias, dk, hck))


def _scan_core_gpa_bwd(T, softplus, has_bias, has_d, interpret, reverse,
                       swap_c, res, dy):
    u, wdt, wb, wc, a3, bias, dk, hck = res
    du, dA, dwdt, dwb, dwc, dbias, dD = _bwd_call(
        u, wdt, a3, wb, wc, bias, dk, hck, dy,
        T, softplus, has_bias, has_d, interpret, reverse, proj=True,
        swap_c=swap_c,
    )
    # y_acc enters linearly (y = scan + y_acc): its cotangent is dy itself
    # (y_acc shares u's io dtype — both cast by the wrapper)
    return (du.astype(u.dtype), dwdt.astype(wdt.dtype),
            dwb.astype(wb.dtype), dwc.astype(wc.dtype), dA, dbias, dD,
            dy.astype(u.dtype))


_scan_core_gpa.defvjp(_scan_core_gpa_fwd, _scan_core_gpa_bwd)


def _ml_bwd(res, dy, T, softplus, has_bias, has_d, interpret, reverse,
            swap_c):
    """Shared bwd for the multi-layout cores: u/dy feed the bwd kernel as
    per-layout operands and du comes back per layout — no stacked-shim
    HBM passes (each was a y-sized write+read+layout-fixup per SS2D bwd)."""
    u0, u1, wdt, wb, wc, a3, bias, dk, hck = res
    (du0, du1), dA, dwdt, dwb, dwc, dbias, dD = _bwd_call_ml(
        (u0, u1), wdt, a3, wb, wc, bias, dk, hck, (dy[0], dy[1]),
        T, softplus, has_bias, has_d, interpret, reverse, swap_c=swap_c,
    )
    return (du0.astype(u0.dtype), du1.astype(u1.dtype),
            dwdt.astype(wdt.dtype), dwb.astype(wb.dtype),
            dwc.astype(wc.dtype), dA, dbias, dD)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14)
)
def _scan_core_gp_ml(u0, u1, wdt, wb, wc, a3, bias, dk,
                     T, softplus, has_bias, has_d, interpret, reverse,
                     swap_c=False):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    ys, _ = _fwd_call_ml((u0, u1), wdt, a3, wb, wc, bias, dk, T, flags,
                         interpret, reverse, with_hck=False)
    return ys


def _scan_core_gp_ml_fwd(u0, u1, wdt, wb, wc, a3, bias, dk,
                         T, softplus, has_bias, has_d, interpret, reverse,
                         swap_c=False):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    ys, hck = _fwd_call_ml((u0, u1), wdt, a3, wb, wc, bias, dk, T, flags,
                           interpret, reverse, with_hck=True)
    return ys, _name_res((u0, u1, wdt, wb, wc, a3, bias, dk, hck))


def _scan_core_gp_ml_bwd(T, softplus, has_bias, has_d, interpret, reverse,
                         swap_c, res, dy):
    return _ml_bwd(res, dy, T, softplus, has_bias, has_d, interpret,
                   reverse, swap_c)


_scan_core_gp_ml.defvjp(_scan_core_gp_ml_fwd, _scan_core_gp_ml_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16)
)
def _scan_core_gp_mla(u0, u1, wdt, wb, wc, a3, bias, dk, ya0, ya1,
                      T, softplus, has_bias, has_d, interpret, reverse,
                      swap_c=False):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    ys, _ = _fwd_call_ml((u0, u1), wdt, a3, wb, wc, bias, dk, T, flags,
                         interpret, reverse, with_hck=False,
                         y_accs=(ya0, ya1))
    return ys


def _scan_core_gp_mla_fwd(u0, u1, wdt, wb, wc, a3, bias, dk, ya0, ya1,
                          T, softplus, has_bias, has_d, interpret, reverse,
                          swap_c=False):
    flags = dict(softplus=softplus, has_bias=has_bias, has_d=has_d,
                 swap_c=swap_c)
    ys, hck = _fwd_call_ml((u0, u1), wdt, a3, wb, wc, bias, dk, T, flags,
                           interpret, reverse, with_hck=True,
                           y_accs=(ya0, ya1))
    return ys, _name_res((u0, u1, wdt, wb, wc, a3, bias, dk, hck))


def _scan_core_gp_mla_bwd(T, softplus, has_bias, has_d, interpret, reverse,
                          swap_c, res, dy):
    grads = _ml_bwd(res, dy, T, softplus, has_bias, has_d, interpret,
                    reverse, swap_c)
    u0 = res[0]
    # y_acc enters linearly: cotangents are the per-layout dy passthrough
    return grads + (dy[0].astype(u0.dtype), dy[1].astype(u0.dtype))


_scan_core_gp_mla.defvjp(_scan_core_gp_mla_fwd, _scan_core_gp_mla_bwd)


def selective_scan_g(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False,
    block_t: int = 512, fold_batch: bool = True, interpret: bool | None = None,
    reverse: bool = False,
):
    """Grouped channel-last selective scan with G ILP chains per grid step.

    Args:
      u, delta: (B, G, L, dg).
      A: (G, N, dg) negative state matrix.
      B, C: (B, G, L, N).
      D: (G, dg) optional skip; delta_bias: (G, dg) optional.
      reverse: scan the sequence last-to-first IN PLACE — outputs land at
        their physical positions, so `selective_scan_g(..., reverse=True)`
        == `flip(selective_scan_g(flip(u), ..))` with zero flip copies.
        This implements the reference's flipped scan directions
        (CrossScan k=2,3, vmamba.py:80-98) without materializing them.
    Returns y (B, G, L, dg); fp32 compute, dtype-preserving. Bias, softplus
    and the D-skip run inside the kernel.
    """
    dtype_in = u.dtype
    batch, G, L, dg = u.shape
    N = A.shape[1]

    from sigma_tpu.utils import flops as _flops

    _flops.record_scan(
        9 * batch * G * L * dg * N
        + (batch * G * L * dg if D is not None else 0)
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # bf16 streams ride through the kernel (converted to fp32 per-block in
    # VMEM — halves the HBM traffic and kills the XLA-side convert passes);
    # weights/state stay fp32, matching the reference kernel's bf16-input
    # mode (selective_scan.cpp:175-176)
    io_dtype = jnp.bfloat16 if dtype_in == jnp.bfloat16 else jnp.float32
    uf = u.astype(io_dtype)
    d_f = delta.astype(io_dtype)
    a_f = A.astype(jnp.float32) * _LOG2E  # kernel computes exp2
    b_f = B.astype(io_dtype)
    c_f = C.astype(io_dtype)
    has_bias = delta_bias is not None
    has_d = D is not None
    bias_f = (
        delta_bias.astype(jnp.float32).reshape(G, dg)
        if has_bias else jnp.zeros((G, dg), jnp.float32)
    )
    dk_f = (
        D.astype(jnp.float32).reshape(G, dg)
        if has_d else jnp.zeros((G, dg), jnp.float32)
    )

    # pad the state dim to the fp32 sublane tile (A=0/B=0 rows are inert)
    npad = (-N) % 8
    if npad:
        a_f = jnp.pad(a_f, ((0, 0), (0, npad), (0, 0)))
        b_f = jnp.pad(b_f, ((0, 0), (0, 0), (0, 0), (0, npad)))
        c_f = jnp.pad(c_f, ((0, 0), (0, 0), (0, 0), (0, npad)))
        N = N + npad

    # Fold (part of) the batch into G for more ILP chains per grid step
    # (eff_g ~ 8 measured best: wider folds shrink T and quadruple the bwd
    # hck checkpoint), and tile dg for wide shapes. The planner scores
    # (fold, dgt, T) jointly against the VMEM model.
    plan = _plan_g_layout(batch, G, N, dg, L, block_t, fold_batch,
                          sb=2 if _state_dtype(u.dtype) == jnp.bfloat16
                          else 4)
    if plan is None:
        # nothing fits the grouped kernel's VMEM model: per-row kernel
        from sigma_tpu.ops.pallas_scan_seq import selective_scan_seq_cl

        n0 = B.shape[-1]  # original N (pre-sublane-padding)
        if reverse:  # rare path: explicit flips are acceptable here
            u, delta, B, C = (t[:, :, ::-1] for t in (u, delta, B, C))
        y = selective_scan_seq_cl(
            u.reshape(batch * G, L, dg),
            delta.reshape(batch * G, L, dg),
            A,
            B.reshape(batch * G, L, n0),
            C.reshape(batch * G, L, n0),
            D=D.reshape(G, dg) if D is not None else None,
            delta_bias=delta_bias,
            delta_softplus=delta_softplus,
            interpret=interpret,
        )
        y = y.reshape(batch, G, L, dg)
        return y[:, :, ::-1] if reverse else y

    fold, dgt, T = plan
    eff_g = fold * G
    if fold > 1:
        uf = uf.reshape(batch // fold, fold * G, L, dg)
        d_f = d_f.reshape(batch // fold, fold * G, L, dg)
        b_f = b_f.reshape(batch // fold, fold * G, L, N)
        c_f = c_f.reshape(batch // fold, fold * G, L, N)
        a_f = jnp.tile(a_f, (fold, 1, 1))
        bias_f = jnp.tile(bias_f, (fold, 1))
        dk_f = jnp.tile(dk_f, (fold, 1))

    pad = (-L) % T
    if pad:
        uf = jnp.pad(uf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        d_f = jnp.pad(d_f, ((0, 0), (0, 0), (0, pad), (0, 0)))
        b_f = jnp.pad(b_f, ((0, 0), (0, 0), (0, pad), (0, 0)))
        c_f = jnp.pad(c_f, ((0, 0), (0, 0), (0, pad), (0, 0)))

    y = _scan_core_g(
        uf, d_f, a_f, b_f, c_f, bias_f, dk_f,
        T, dgt, bool(delta_softplus), has_bias, has_d, interpret,
        bool(reverse),
    )
    if pad:
        y = y[:, :, :L]
    if fold > 1:
        y = y.reshape(batch, G, L, dg)
    return y.astype(dtype_in)


def _plan_proj(batch, G, dg, L, n_planned, block_t, fold_batch, sb=4):
    """Joint (fold, T) planner for the fused-projection kernel: folding
    batch into G adds ILP chains but multiplies the in-VMEM weight /
    weight-grad copies. Scored like _plan_g_layout: padding-discounted
    block length first, then chains. Returns (key, fold, T) or None."""
    best = None
    folds = [1]
    if fold_batch and batch > 1 and G < 8:
        folds = [c for c in range(min(batch, 8 // G), 0, -1)
                 if batch % c == 0]
    for cand in folds:
        if cand * G * n_planned * dg * 4 > 2 * 1024 * 1024:
            continue
        if 6 * cand * G * dg * dg > 12 * 1024 * 1024:
            continue
        t_c = _block_t(cand * G, dg, n_planned, block_t, L, proj=True, sb=sb)
        eff_t = min(t_c, 128) * L / (L + (-L) % t_c)
        key = (eff_t, cand * G)
        if best is None or key > best[0]:
            best = (key, cand, t_c)
    return best


def selective_scan_g_proj(
    u, w_dt, w_b, w_c, A, D=None, delta_bias=None, delta_softplus=False,
    block_t: int = 512, fold_batch: bool = True, interpret: bool | None = None,
    reverse: bool = False, swap_groups_c: bool = False, y_accum=None,
):
    """Fused-projection grouped scan: dt/B/C are PROJECTED FROM u ON THE
    MXU INSIDE THE KERNEL (dt = u @ w_dt, B = u @ w_b, C = u @ w_c per
    group), so the three streamed tensors — ~550MB of HBM writes+reads per
    stage-1 SS2D call — never materialize. This is the TPU analogue of the
    reference's `cross_selective_scan` einsum pipeline (vmamba.py:195-207)
    collapsed into the kernel.

    Args:
      u: (B, G, L, dg).
      w_dt: (G, dg, dg) composed dt projection (x_proj[:, :R] @ dt_proj).
      w_b, w_c: (G, dg, N).
      A: (G, N, dg) negative; D/delta_bias: (G, dg) optional.
      reverse: as in `selective_scan_g`.
      swap_groups_c: with G == 2, each chain's scan consumes the OTHER
        chain's projected C — CroMB's cross-modal attention
        (Cross_Mamba_Attention_SSM, vmamba.py:1528-1539) without ever
        materializing the projection streams.
      y_accum: optional (B, G, L, dg) tensor added into y INSIDE the
        kernel — the direction-group pair sum of CrossMerge
        (vmamba.py:100-121) without a separate XLA add pass over y-sized
        HBM traffic.
    Returns y (B, G, L, dg), dtype-preserving; scan math fp32.
    """
    dtype_in = u.dtype
    batch, G, L, dg = u.shape
    N = A.shape[1]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # wide shapes fall back to the decomposed path (XLA projections +
    # streamed kernel) — same math. Triggers: wide STATE (the per-chain
    # (G,N,dg) stashes crush T), wide dg (the bwd's in-VMEM weights +
    # (G,dg,dg) f32 weight-grad block scale quadratically with dg), or a
    # degenerate planned block length (see the joint fold/T planner —
    # sigma_base stage 3 at dg=1024 fits the weight budget but only at T=8,
    # where the streamed kernel's dg-tiling wins).
    n_planned = N + ((-N) % 8)

    assert not swap_groups_c or G == 2, "C-swap needs exactly 2 groups"
    plan = _plan_proj(batch, G, dg, L, n_planned, block_t, fold_batch,
                      sb=2 if _state_dtype(u.dtype) == jnp.bfloat16
                      else 4)
    if plan is None or (plan[2] < 64 and plan[2] < L):
        dts = jnp.einsum("bgld,gde->bgle", u, w_dt,
                         preferred_element_type=jnp.float32)
        bs = jnp.einsum("bgld,gdn->bgln", u, w_b,
                        preferred_element_type=jnp.float32)
        cs = jnp.einsum("bgld,gdn->bgln", u, w_c,
                        preferred_element_type=jnp.float32)
        if swap_groups_c:
            cs = jnp.flip(cs, axis=1)
        y = selective_scan_g(
            u, dts, A, bs, cs, D=D, delta_bias=delta_bias,
            delta_softplus=delta_softplus, block_t=block_t,
            fold_batch=fold_batch, interpret=interpret, reverse=reverse,
        )
        return y if y_accum is None else y + y_accum
    fold, T = plan[1], plan[2]

    from sigma_tpu.utils import flops as _flops

    # scan closed form + the in-kernel MXU projections (opaque to the
    # jaxpr walker; the decomposed fallback above is counted normally)
    _flops.record_scan(
        9 * batch * G * L * dg * N
        + (batch * G * L * dg if D is not None else 0)
        + 2 * batch * G * L * dg * (dg + 2 * N)
    )

    io_dtype = jnp.bfloat16 if dtype_in == jnp.bfloat16 else jnp.float32
    uf = u.astype(io_dtype)
    wdt_f = w_dt.astype(io_dtype)
    wb_f = w_b.astype(io_dtype)
    wc_f = w_c.astype(io_dtype)
    a_f = A.astype(jnp.float32) * _LOG2E  # kernel computes exp2
    has_bias = delta_bias is not None
    has_d = D is not None
    bias_f = (
        delta_bias.astype(jnp.float32).reshape(G, dg)
        if has_bias else jnp.zeros((G, dg), jnp.float32)
    )
    dk_f = (
        D.astype(jnp.float32).reshape(G, dg)
        if has_d else jnp.zeros((G, dg), jnp.float32)
    )

    # pad the state dim to the fp32 sublane tile (zero B/C columns and
    # A rows are inert)
    npad = (-N) % 8
    if npad:
        a_f = jnp.pad(a_f, ((0, 0), (0, npad), (0, 0)))
        wb_f = jnp.pad(wb_f, ((0, 0), (0, 0), (0, npad)))
        wc_f = jnp.pad(wc_f, ((0, 0), (0, 0), (0, npad)))
        N = N + npad

    # fold/T come from the joint planner above (folding batch into G adds
    # ILP chains but multiplies the in-VMEM weight/weight-grad copies —
    # scored like _plan_g_layout: block length first, then chains)
    if fold > 1:
        uf = uf.reshape(batch // fold, fold * G, L, dg)
        wdt_f = jnp.tile(wdt_f, (fold, 1, 1))
        wb_f = jnp.tile(wb_f, (fold, 1, 1))
        wc_f = jnp.tile(wc_f, (fold, 1, 1))
        a_f = jnp.tile(a_f, (fold, 1, 1))
        bias_f = jnp.tile(bias_f, (fold, 1))
        dk_f = jnp.tile(dk_f, (fold, 1))

    pad = (-L) % T
    if pad:
        uf = jnp.pad(uf, ((0, 0), (0, 0), (0, pad), (0, 0)))

    if y_accum is not None:
        ya = y_accum.astype(io_dtype)
        if fold > 1:
            ya = ya.reshape(batch // fold, fold * G, L, dg)
        if pad:
            ya = jnp.pad(ya, ((0, 0), (0, 0), (0, pad), (0, 0)))
        y = _scan_core_gpa(
            uf, wdt_f, wb_f, wc_f, a_f, bias_f, dk_f, ya,
            T, bool(delta_softplus), has_bias, has_d, interpret,
            bool(reverse), bool(swap_groups_c),
        )
    else:
        y = _scan_core_gp(
            uf, wdt_f, wb_f, wc_f, a_f, bias_f, dk_f,
            T, bool(delta_softplus), has_bias, has_d, interpret,
            bool(reverse), bool(swap_groups_c),
        )
    if pad:
        y = y[:, :, :L]
    if fold > 1:
        y = y.reshape(batch, G, L, dg)
    return y.astype(dtype_in)


def selective_scan_g_proj_ml(
    us, w_dt, w_b, w_c, A, D=None, delta_bias=None, delta_softplus=False,
    block_t: int = 512, fold_batch: bool = True,
    interpret: bool | None = None, reverse: bool = False,
    swap_groups_c: bool = False, y_accum=None,
):
    """Multi-layout fused-projection scan: like `selective_scan_g_proj`
    with G == 2, but the two chains arrive as SEPARATE (B, L, dg) operands
    (`us`) and y returns as two (B, L, dg) outputs. For SS2D the operands
    are the row-major sequence (a free reshape of the conv output — never
    copied) and its transpose; for CroMB the two modality sequences. The
    XLA stack fusion + its layout fixup copy on the way in, and the y
    split on the way out (~2.8 ms of HBM traffic per stage-1 SS2D), never
    exist. `y_accum`: matching tuple added in-kernel (CrossMerge pair sum).

    Falls back to the stacked path off-TPU or when the planner rejects the
    shape — identical math either way.
    """
    u0, u1 = us
    dtype_in = u0.dtype
    batch, L, dg = u0.shape
    G = 2
    N = A.shape[1]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_planned = N + ((-N) % 8)
    plan = _plan_proj(batch, G, dg, L, n_planned, block_t, fold_batch,
                      sb=2 if _state_dtype(u0.dtype) == jnp.bfloat16
                      else 4)
    if plan is None or (plan[2] < 64 and plan[2] < L):
        # stacked fallback (rejected shapes): same math
        u_st = jnp.stack([u0, u1], axis=1)
        ya = None
        if y_accum is not None:
            ya = jnp.stack([y_accum[0], y_accum[1]], axis=1)
        y = selective_scan_g_proj(
            u_st, w_dt, w_b, w_c, A, D=D, delta_bias=delta_bias,
            delta_softplus=delta_softplus, block_t=block_t,
            fold_batch=fold_batch, interpret=interpret, reverse=reverse,
            swap_groups_c=swap_groups_c, y_accum=ya,
        )
        return y[:, 0], y[:, 1]
    fold, T = plan[1], plan[2]

    from sigma_tpu.utils import flops as _flops

    _flops.record_scan(
        9 * batch * G * L * dg * N
        + (batch * G * L * dg if D is not None else 0)
        + 2 * batch * G * L * dg * (dg + 2 * N)
    )

    io_dtype = jnp.bfloat16 if dtype_in == jnp.bfloat16 else jnp.float32
    u0f = u0.astype(io_dtype).reshape(batch // fold, fold, L, dg)
    u1f = u1.astype(io_dtype).reshape(batch // fold, fold, L, dg)
    wdt_f = w_dt.astype(io_dtype)
    wb_f = w_b.astype(io_dtype)
    wc_f = w_c.astype(io_dtype)
    a_f = A.astype(jnp.float32) * _LOG2E  # kernel computes exp2
    has_bias = delta_bias is not None
    has_d = D is not None
    bias_f = (
        delta_bias.astype(jnp.float32).reshape(G, dg)
        if has_bias else jnp.zeros((G, dg), jnp.float32)
    )
    dk_f = (
        D.astype(jnp.float32).reshape(G, dg)
        if has_d else jnp.zeros((G, dg), jnp.float32)
    )
    npad = (-N) % 8
    if npad:
        a_f = jnp.pad(a_f, ((0, 0), (0, npad), (0, 0)))
        wb_f = jnp.pad(wb_f, ((0, 0), (0, 0), (0, npad)))
        wc_f = jnp.pad(wc_f, ((0, 0), (0, 0), (0, npad)))
    if fold > 1:
        wdt_f = jnp.tile(wdt_f, (fold, 1, 1))
        wb_f = jnp.tile(wb_f, (fold, 1, 1))
        wc_f = jnp.tile(wc_f, (fold, 1, 1))
        a_f = jnp.tile(a_f, (fold, 1, 1))
        bias_f = jnp.tile(bias_f, (fold, 1))
        dk_f = jnp.tile(dk_f, (fold, 1))

    pad = (-L) % T
    if pad:
        u0f = jnp.pad(u0f, ((0, 0), (0, 0), (0, pad), (0, 0)))
        u1f = jnp.pad(u1f, ((0, 0), (0, 0), (0, pad), (0, 0)))

    args = (T, bool(delta_softplus), has_bias, has_d, interpret,
            bool(reverse), bool(swap_groups_c))
    if y_accum is not None:
        ya0 = y_accum[0].astype(io_dtype).reshape(
            batch // fold, fold, L, dg
        )
        ya1 = y_accum[1].astype(io_dtype).reshape(
            batch // fold, fold, L, dg
        )
        if pad:
            ya0 = jnp.pad(ya0, ((0, 0), (0, 0), (0, pad), (0, 0)))
            ya1 = jnp.pad(ya1, ((0, 0), (0, 0), (0, pad), (0, 0)))
        y0, y1 = _scan_core_gp_mla(
            u0f, u1f, wdt_f, wb_f, wc_f, a_f, bias_f, dk_f, ya0, ya1, *args
        )
    else:
        y0, y1 = _scan_core_gp_ml(
            u0f, u1f, wdt_f, wb_f, wc_f, a_f, bias_f, dk_f, *args
        )
    if pad:
        y0, y1 = y0[:, :, :L], y1[:, :, :L]
    y0 = y0.reshape(batch, L, dg).astype(dtype_in)
    y1 = y1.reshape(batch, L, dg).astype(dtype_in)
    return y0, y1


# ---------------------------------------------------------------------------
# Image-layout fused SS2D kernel: one pallas_call per SS2D runs BOTH scan
# directions (dir grid dim, static per-dir bodies) over BOTH physical
# layouts — row blocks (hw) and column blocks (wh, transposed in VMEM) of
# the same (B, H, W, dg) image — with dt/B/C projected on the MXU inside.
# Replaces, per SS2D: the CrossScan u-stack copy, the wh transposes of x
# and y (and their bwd adjoints), and one of two kernel launches. This is
# the TPU rewrite of CrossScan/CrossMerge (vmamba.py:80-121) taken to its
# endpoint: the 4-direction expansion never exists outside VMEM.
# Feasible when T = H*W/gcd(H,W) fits the VMEM model (the 480x640 ladder's
# stages 1-3); callers fall back to the stacked-layout path otherwise.
# ---------------------------------------------------------------------------


# the image kernel carries whole-T f32 projection scratches plus double-
# buffered hck blocks; give it a higher scoped-VMEM cap than the streamed
# kernels (v5e has 128MB physical VMEM) so the planner can afford fold=2
_VMEM_LIMIT_IMG = 104 * 1024 * 1024


def _img_params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_IMG)


def _img_bcast(v2, f):
    """(2, ...) per-layout value -> (2f, ...) per-chain value."""
    return jnp.concatenate(
        [jnp.broadcast_to(v2[j], (f,) + v2.shape[1:]) for j in (0, 1)], 0
    )


def _fwd_kernel_img(xh_ref, xw_ref, wdt_ref, a_ref, wb_ref, wc_ref,
                    bias_ref, dk_ref, *refs,
                    T, th, tw, unroll, softplus, has_bias, has_d,
                    with_hck, ck_every):
    if with_hck:
        yh_ref, yw_ref, hck_ref, u_scr, h_scr, y_scr, d_scr, b_scr, c_scr \
            = refs
    else:
        yh_ref, yw_ref, u_scr, h_scr, y_scr, d_scr, b_scr, c_scr = refs
    il = pl.program_id(2)
    dir_id = pl.program_id(1)

    @pl.when(il == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    f = xh_ref.shape[1]
    c2 = 2 * f
    dg = xh_ref.shape[-1]
    n = a_ref.shape[-2]
    # chain order: [hw folds..., wh folds...]; wh transposed to scan order
    u_scr[0:f] = xh_ref[0].reshape(f, T, dg)
    u_scr[f:c2] = jnp.swapaxes(xw_ref[0], 1, 2).reshape(f, T, dg)

    for g in range(c2):
        jg = g // f
        ug = u_scr[g]
        ct = (((1,), (0,)), ((), ()))
        d_scr[g] = jax.lax.dot_general(
            ug, wdt_ref[0, jg], ct, preferred_element_type=jnp.float32)
        b_scr[g] = jax.lax.dot_general(
            ug, wb_ref[0, jg], ct, preferred_element_type=jnp.float32)
        c_scr[g] = jax.lax.dot_general(
            ug, wc_ref[0, jg], ct, preferred_element_type=jnp.float32)

    A = _img_bcast(a_ref[0], f)                      # (2f, N, dg)
    bias = _img_bcast(bias_ref[0], f)                # (2f, dg)
    dkv = _img_bcast(dk_ref[0], f)
    nch = T // unroll

    def run(reverse):
        ks = list(reversed(range(unroll))) if reverse else list(range(unroll))

        def body(i, h):
            t0 = (nch - 1 - i if reverse else i) * unroll
            d_raw = d_scr[:, pl.ds(t0, unroll), :]
            b_blk = b_scr[:, pl.ds(t0, unroll), :]
            c_blk = c_scr[:, pl.ds(t0, unroll), :]
            d_blk = d_raw + bias[:, None, :] if has_bias else d_raw
            if softplus:
                d_blk = jax.nn.softplus(d_blk)
            u_blk = u_scr[:, pl.ds(t0, unroll), :].astype(jnp.float32)
            du_blk = d_blk * u_blk
            c_t = jnp.swapaxes(c_blk, 1, 2)
            a_blk = jnp.exp2(d_blk[:, :, None, :] * A[:, None, :, :])
            dub_blk = du_blk[:, :, None, :] * b_blk[:, :, :, None]
            ys = [None] * unroll
            for idx, k in enumerate(ks):
                if with_hck and idx % ck_every == 0:
                    hck_ref[0, 0, 0,
                            i * (unroll // ck_every) + idx // ck_every] = h
                h = a_blk[:, k] * h + dub_blk[:, k]
                ys[k] = jnp.sum(c_t[:, :, k : k + 1] * h, axis=1)
            y_blk = jnp.stack(ys, axis=1)
            if has_d:
                y_blk = y_blk + dkv[:, None, :] * u_blk
            y_scr[:, pl.ds(t0, unroll), :] = y_blk.astype(y_scr.dtype)
            return h

        h_scr[...] = jax.lax.fori_loop(0, nch, body, h_scr[...])

    # static per-direction bodies (in-block token order must be static)
    @pl.when(dir_id == 0)
    def _():
        run(False)

    @pl.when(dir_id == 1)
    def _():
        run(True)

    yh_ref[0, 0] = y_scr[0:f].reshape(f, th, xh_ref.shape[3], dg)
    yw_ref[0, 0] = jnp.swapaxes(
        y_scr[f:c2].reshape(f, tw, xw_ref.shape[2], dg), 1, 2
    )


def _bwd_kernel_img(xh_ref, xw_ref, wdt_ref, a_ref, wb_ref, wc_ref,
                    bias_ref, dk_ref, hck_ref, dyh_ref, dyw_ref, *refs,
                    T, th, tw, unroll, softplus, has_bias, has_d, ck_ratio):
    (duh_ref, duw_ref, dwdt_ref, dwb_ref, dwc_ref, dA_ref, dbias_ref,
     dD_ref,
     u_scr, dy_scr, du_scr, d_scr, b_scr, c_scr, dd_scr, db_scr, dc_scr,
     dh_scr, dA_scr, dbias_scr, dD_scr, hloc_scr, dhp_scr) = refs
    j = pl.program_id(2)
    dir_id = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dA_scr[...] = jnp.zeros_like(dA_scr)
        dbias_scr[...] = jnp.zeros_like(dbias_scr)
        dD_scr[...] = jnp.zeros_like(dD_scr)
        dwdt_ref[...] = jnp.zeros_like(dwdt_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)

    f = xh_ref.shape[1]
    c2 = 2 * f
    dg = xh_ref.shape[-1]
    u_scr[0:f] = xh_ref[0].reshape(f, T, dg)
    u_scr[f:c2] = jnp.swapaxes(xw_ref[0], 1, 2).reshape(f, T, dg)
    dy_scr[0:f] = dyh_ref[0].reshape(f, T, dg)
    dy_scr[f:c2] = jnp.swapaxes(dyw_ref[0], 1, 2).reshape(f, T, dg)

    for g in range(c2):
        jg = g // f
        ug = u_scr[g]
        ct = (((1,), (0,)), ((), ()))
        d_scr[g] = jax.lax.dot_general(
            ug, wdt_ref[0, jg], ct, preferred_element_type=jnp.float32)
        b_scr[g] = jax.lax.dot_general(
            ug, wb_ref[0, jg], ct, preferred_element_type=jnp.float32)
        c_scr[g] = jax.lax.dot_general(
            ug, wc_ref[0, jg], ct, preferred_element_type=jnp.float32)

    A = _img_bcast(a_ref[0], f)          # (2f, N, dg), pre-scaled log2e
    A_ln = A * _LN2
    bias = _img_bcast(bias_ref[0], f)
    dkv = _img_bcast(dk_ref[0], f)
    nch = T // unroll

    def d_eff(d_raw):
        d_blk = d_raw + bias[:, None, :] if has_bias else d_raw
        return jax.nn.softplus(d_blk) if softplus else d_blk

    def run(reverse):
        ks = list(reversed(range(unroll))) if reverse else list(range(unroll))

        def pchunk(lc):
            return nch - 1 - lc if reverse else lc

        def bwd_body(i, dh):
            lc = nch - 1 - i
            t0 = pchunk(lc) * unroll
            d_blk = d_eff(d_scr[:, pl.ds(t0, unroll), :])
            b_blk = b_scr[:, pl.ds(t0, unroll), :]
            c_blk = c_scr[:, pl.ds(t0, unroll), :]
            u_blk = u_scr[:, pl.ds(t0, unroll), :].astype(jnp.float32)
            dy_blk = dy_scr[:, pl.ds(t0, unroll), :].astype(jnp.float32)
            du_blk = d_blk * u_blk
            if ck_ratio == 1:
                h = hck_ref[0, 0, 0, lc]
            else:
                base = (lc // ck_ratio) * ck_ratio
                h0 = hck_ref[0, 0, 0, lc // ck_ratio]

                def pre_body(pj, hh):
                    tp = pchunk(base + pj) * unroll
                    d_p = d_eff(d_scr[:, pl.ds(tp, unroll), :])
                    u_p = u_scr[:, pl.ds(tp, unroll), :].astype(jnp.float32)
                    b_tp = jnp.swapaxes(b_scr[:, pl.ds(tp, unroll), :], 1, 2)
                    du_p = d_p * u_p
                    for k in ks:
                        a_t = jnp.exp2(d_p[:, k, :][:, None, :] * A)
                        hh = a_t * hh + (
                            du_p[:, k, :][:, None, :] * b_tp[:, :, k : k + 1]
                        )
                    return hh

                h = jax.lax.fori_loop(0, lc - base, pre_body, h0)
            # hoisted (U, 2f, N, dg) layouts; same math as _bwd_kernel
            d_u = jnp.swapaxes(d_blk, 0, 1)
            b_u = jnp.swapaxes(b_blk, 0, 1)
            a_blk = jnp.exp2(d_u[:, :, None, :] * A[None])
            dub_blk = jnp.swapaxes(du_blk, 0, 1)[:, :, None, :] \
                * b_u[:, :, :, None]
            cdy_blk = jnp.swapaxes(dy_blk, 0, 1)[:, :, None, :] \
                * jnp.swapaxes(c_blk, 0, 1)[:, :, :, None]
            for k in ks:
                hloc_scr[k] = h
                h = a_blk[k] * h + dub_blk[k]
            for k in reversed(ks):
                dhp = dh + cdy_blk[k]
                dhp_scr[k] = dhp
                dh = a_blk[k] * dhp
            dhp_all = dhp_scr[...]
            hloc_all = hloc_scr[...]
            ahp = a_blk * hloc_all
            h_t = ahp + dub_blk
            dy_u = jnp.swapaxes(dy_blk, 0, 1)[:, :, None, :]
            du_u = jnp.swapaxes(du_blk, 0, 1)[:, :, None, :]
            s1 = jnp.sum(dhp_all * b_u[:, :, :, None], axis=2)
            dus_u = d_u * s1
            p = dhp_all * ahp
            dds_u = jnp.sum(A_ln * p, axis=2) + jnp.swapaxes(u_blk, 0, 1) * s1
            dA_scr[...] = dA_scr[...] + jnp.sum(
                p * d_u[:, :, None, :], axis=0
            )
            dbs_g = jnp.swapaxes(jnp.sum(dhp_all * du_u, axis=3), 0, 1)
            dcs_g = jnp.swapaxes(jnp.sum(h_t * dy_u, axis=3), 0, 1)
            du_blk_g = jnp.swapaxes(dus_u, 0, 1)
            dd_eff = jnp.swapaxes(dds_u, 0, 1)
            if has_d:
                du_blk_g = du_blk_g + dy_blk * dkv[:, None, :]
                dD_scr[...] = dD_scr[...] + jnp.sum(dy_blk * u_blk, axis=1)
            if softplus:
                pre = d_scr[:, pl.ds(t0, unroll), :]
                if has_bias:
                    pre = pre + bias[:, None, :]
                dd_raw = dd_eff * jax.nn.sigmoid(pre)
            else:
                dd_raw = dd_eff
            if has_bias:
                dbias_scr[...] = dbias_scr[...] + jnp.sum(dd_raw, axis=1)
            du_scr[:, pl.ds(t0, unroll), :] = du_blk_g.astype(du_scr.dtype)
            dd_scr[:, pl.ds(t0, unroll), :] = dd_raw
            db_scr[:, pl.ds(t0, unroll), :] = dbs_g
            dc_scr[:, pl.ds(t0, unroll), :] = dcs_g
            return dh

        dh_scr[...] = jax.lax.fori_loop(0, nch, bwd_body, dh_scr[...])

    @pl.when(dir_id == 0)
    def _():
        run(False)

    @pl.when(dir_id == 1)
    def _():
        run(True)

    # weight grads + the dd/dB/dC -> du chain; weights selected per layout
    io = u_scr.dtype
    for g in range(c2):
        jg = g // f
        u_g = u_scr[g]
        dd_g = dd_scr[g].astype(io)
        db_g = db_scr[g].astype(io)
        dc_g = dc_scr[g].astype(io)
        ct = (((0,), (0,)), ((), ()))
        dwdt_ref[0, 0, jg] += jax.lax.dot_general(
            u_g, dd_g, ct, preferred_element_type=jnp.float32)
        dwb_ref[0, 0, jg] += jax.lax.dot_general(
            u_g, db_g, ct, preferred_element_type=jnp.float32)
        dwc_ref[0, 0, jg] += jax.lax.dot_general(
            u_g, dc_g, ct, preferred_element_type=jnp.float32)
        cm = (((1,), (1,)), ((), ()))
        chain = jax.lax.dot_general(
            dd_g, wdt_ref[0, jg], cm, preferred_element_type=jnp.float32)
        chain = chain + jax.lax.dot_general(
            db_g, wb_ref[0, jg], cm, preferred_element_type=jnp.float32)
        chain = chain + jax.lax.dot_general(
            dc_g, wc_ref[0, jg], cm, preferred_element_type=jnp.float32)
        du_scr[g] = (du_scr[g].astype(jnp.float32) + chain).astype(io)
    duh_ref[0, 0] = du_scr[0:f].reshape(f, th, xh_ref.shape[3], dg)
    duw_ref[0, 0] = jnp.swapaxes(
        du_scr[f:c2].reshape(f, tw, xw_ref.shape[2], dg), 1, 2
    )
    # per-layout reductions over the fold chains
    f32 = jnp.float32
    dA_ref[0, 0] = (
        dA_scr[...].reshape(2, f, *dA_scr.shape[1:]).sum(axis=1) * _LN2
    ).astype(f32)
    dbias_ref[0, 0] = dbias_scr[...].reshape(2, f, -1).sum(axis=1)
    dD_ref[0, 0] = dD_scr[...].reshape(2, f, -1).sum(axis=1)


def _plan_img(batch, H, W, dg, N, io_bytes):
    """Geometry + fold + checkpoint interval for the image kernel.

    T tokens must be both `th` whole rows and `tw` whole columns of the
    image (th*W == tw*H), and Mosaic requires the column blocks' second-
    minor dim (tw) to be a multiple of 8 — so the base tw = W/gcd is scaled
    up accordingly. (fold, ck) are chosen jointly under the VMEM model:
    more fold chains = more ILP, smaller ck = less bwd gap recompute, both
    cost VMEM. Returns (fold, th, tw, T, ck) or None."""
    import math as _math

    g = _math.gcd(H, W)
    th0, tw0 = H // g, W // g
    m = 8 // _math.gcd(8, tw0)
    th, tw = m * th0, m * tw0
    T = th * W
    L = H * W
    if T % 32 or L % T or T > L or tw > W or th > H:
        return None
    un = 8
    budget = _VMEM_LIMIT_IMG * 11 // 16
    best = None
    for f in (4, 2, 1):
        if batch % f:
            continue
        c2 = 2 * f
        if not _hoist_for(c2, dg, N, un):
            continue
        for ck in (8, 16, 32):
            if T % ck:
                continue
            nck = T // ck
            vm = (
                3 * c2 * T * dg * io_bytes      # u / dy / du scratch
                + 2 * c2 * T * dg * 4           # dt, dd streams (f32)
                + 4 * c2 * T * N * 4            # B/C/dB/dC streams
                + 2 * nck * c2 * N * dg * 4     # hck block, double-buffered
                + 12 * un * c2 * N * dg * 4     # stashes + hoisted temps
                + 6 * f * T * dg * io_bytes * 2  # x/dy/du image blocks (x2)
                + 2 * (dg * dg + 2 * dg * N) * io_bytes
                + 6 * dg * (dg + 2 * N) * 4     # weight-grad out blocks
                + 4 * 1024 * 1024               # slack
            )
            if vm <= budget:
                # prefer chains (ILP) first, then denser checkpoints
                key = (f, -ck)
                if best is None or key > best[0]:
                    best = (key, (f, th, tw, T, ck))
                break  # ck ordered ascending: first fit is densest
    return None if best is None else best[1]


def _img_specs(nl, f, th, tw, H, W, dg, N, c2, T, ck, bwd):
    """BlockSpecs shared by the fwd/bwd image kernels. For the fwd, grid
    step (b, d, j) touches physical L-block j (dir 0) or nl-1-j (dir 1);
    the bwd sweeps logically last-to-first, so the physical block flips."""

    if bwd:
        def phys(d, j):
            return (nl - 1 - j) + d * (2 * j - (nl - 1))
    else:
        def phys(d, j):
            return j + d * (nl - 1 - 2 * j)

    xh = pl.BlockSpec((1, f, th, W, dg),
                      lambda b, d, j: (b, 0, phys(d, j), 0, 0),
                      memory_space=pltpu.VMEM)
    xw = pl.BlockSpec((1, f, H, tw, dg),
                      lambda b, d, j: (b, 0, 0, phys(d, j), 0),
                      memory_space=pltpu.VMEM)
    yh = pl.BlockSpec((1, 1, f, th, W, dg),
                      lambda b, d, j: (b, d, 0, phys(d, j), 0, 0),
                      memory_space=pltpu.VMEM)
    yw = pl.BlockSpec((1, 1, f, H, tw, dg),
                      lambda b, d, j: (b, d, 0, 0, phys(d, j), 0),
                      memory_space=pltpu.VMEM)
    logical = (lambda b, d, j: (b, d, nl - 1 - j, 0, 0, 0, 0)) if bwd \
        else (lambda b, d, j: (b, d, j, 0, 0, 0, 0))
    hck = pl.BlockSpec((1, 1, 1, T // ck, c2, N, dg), logical,
                       memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((1, 2, dg, dg), lambda b, d, j: (d, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    wn = pl.BlockSpec((1, 2, dg, N), lambda b, d, j: (d, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    amat = pl.BlockSpec((1, 2, N, dg), lambda b, d, j: (d, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 2, dg), lambda b, d, j: (d, 0, 0),
                       memory_space=pltpu.VMEM)
    return xh, xw, yh, yw, hck, w2, wn, amat, vec


def _img_flags(softplus, has_bias, has_d):
    return dict(softplus=softplus, has_bias=has_bias, has_d=has_d)


def _fwd_call_img(x5, wdt, wb, wc, a3, bias, dk, geom, flags, interpret,
                  with_hck):
    bprime, f, H, W, dg = x5.shape
    _, th, tw, T, ck = geom
    N = a3.shape[-2]
    c2 = 2 * f
    L = H * W
    nl = L // T
    un = _unroll_fwd(c2, dg, N, T)
    un = max(un, ck)
    xh, xw, yh, yw, hck, w2, wn, amat, vec = _img_specs(
        nl, f, th, tw, H, W, dg, N, c2, T, ck, bwd=False)
    kernel = functools.partial(
        _fwd_kernel_img, T=T, th=th, tw=tw, unroll=un,
        with_hck=with_hck, ck_every=ck, **flags)
    out_specs = [yh, yw]
    out_shape = [
        jax.ShapeDtypeStruct((bprime, 2, f, H, W, dg), x5.dtype),
        jax.ShapeDtypeStruct((bprime, 2, f, H, W, dg), x5.dtype),
    ]
    if with_hck:
        out_specs.append(hck)
        out_shape.append(jax.ShapeDtypeStruct(
            (bprime, 2, nl, T // ck, c2, N, dg), jnp.float32))
    scratch = [
        pltpu.VMEM((c2, T, dg), x5.dtype),    # u
        pltpu.VMEM((c2, N, dg), jnp.float32),  # h carry
        pltpu.VMEM((c2, T, dg), x5.dtype),    # y
        pltpu.VMEM((c2, T, dg), jnp.float32),  # dt
        pltpu.VMEM((c2, T, N), jnp.float32),   # B
        pltpu.VMEM((c2, T, N), jnp.float32),   # C
    ]
    out = pl.pallas_call(
        kernel,
        grid=(bprime, 2, nl),
        in_specs=[xh, xw, w2, amat, wn, wn, vec, vec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=9 * bprime * c2 * L * dg * N
            + 2 * bprime * c2 * L * dg * (dg + 2 * N),
            bytes_accessed=4 * bprime * f * L * dg * 4,
            transcendentals=bprime * c2 * L * dg * N,
        ),
        compiler_params=_img_params(interpret),
        interpret=interpret,
    )(x5, x5, wdt, a3, wb, wc, bias, dk)
    if with_hck:
        return out[0], out[1], out[2]
    return out[0], out[1], None


def _bwd_call_img(x5, wdt, wb, wc, a3, bias, dk, hck, dy5, geom, flags,
                  interpret):
    bprime, f, H, W, dg = x5.shape
    _, th, tw, T, ck = geom
    N = a3.shape[-2]
    c2 = 2 * f
    L = H * W
    nl = L // T
    un = _unroll_for(c2, dg, N)
    xh, xw, yh, yw, hck_s, w2, wn, amat, vec = _img_specs(
        nl, f, th, tw, H, W, dg, N, c2, T, ck, bwd=True)
    kernel = functools.partial(
        _bwd_kernel_img, T=T, th=th, tw=tw, unroll=un,
        ck_ratio=ck // un, **flags)
    const6 = lambda shape: pl.BlockSpec(
        shape, lambda b, d, j: (b, d) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM)
    out_specs = (
        yh, yw,
        const6((1, 1, 2, dg, dg)),
        const6((1, 1, 2, dg, N)),
        const6((1, 1, 2, dg, N)),
        const6((1, 1, 2, N, dg)),
        const6((1, 1, 2, dg)),
        const6((1, 1, 2, dg)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((bprime, 2, f, H, W, dg), x5.dtype),
        jax.ShapeDtypeStruct((bprime, 2, f, H, W, dg), x5.dtype),
        jax.ShapeDtypeStruct((bprime, 2, 2, dg, dg), jnp.float32),
        jax.ShapeDtypeStruct((bprime, 2, 2, dg, N), jnp.float32),
        jax.ShapeDtypeStruct((bprime, 2, 2, dg, N), jnp.float32),
        jax.ShapeDtypeStruct((bprime, 2, 2, N, dg), jnp.float32),
        jax.ShapeDtypeStruct((bprime, 2, 2, dg), jnp.float32),
        jax.ShapeDtypeStruct((bprime, 2, 2, dg), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((c2, T, dg), x5.dtype),     # u
        pltpu.VMEM((c2, T, dg), x5.dtype),     # dy
        pltpu.VMEM((c2, T, dg), x5.dtype),     # du
        pltpu.VMEM((c2, T, dg), jnp.float32),  # dt
        pltpu.VMEM((c2, T, N), jnp.float32),   # B
        pltpu.VMEM((c2, T, N), jnp.float32),   # C
        pltpu.VMEM((c2, T, dg), jnp.float32),  # dd
        pltpu.VMEM((c2, T, N), jnp.float32),   # dB
        pltpu.VMEM((c2, T, N), jnp.float32),   # dC
        pltpu.VMEM((c2, N, dg), jnp.float32),  # dh carry
        pltpu.VMEM((c2, N, dg), jnp.float32),  # dA acc
        pltpu.VMEM((c2, dg), jnp.float32),     # dbias acc
        pltpu.VMEM((c2, dg), jnp.float32),     # dD acc
        pltpu.VMEM((un, c2, N, dg), jnp.float32),  # hloc
        pltpu.VMEM((un, c2, N, dg), jnp.float32),  # dhp
    ]
    return pl.pallas_call(
        kernel,
        grid=(bprime, 2, nl),
        in_specs=[xh, xw, w2, amat, wn, wn, vec, vec, hck_s, xh, xw],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_img_params(interpret),
        interpret=interpret,
    )(x5, x5, wdt, a3, wb, wc, bias, dk, hck, dy5, dy5)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _scan_core_img(x5, wdt, wb, wc, a3, bias, dk,
                   geom, softplus, has_bias, has_d, interpret):
    flags = _img_flags(softplus, has_bias, has_d)
    yh, yw, _ = _fwd_call_img(x5, wdt, wb, wc, a3, bias, dk, geom, flags,
                              interpret, with_hck=False)
    return yh.sum(axis=1) + yw.sum(axis=1)


def _scan_core_img_fwd(x5, wdt, wb, wc, a3, bias, dk,
                       geom, softplus, has_bias, has_d, interpret):
    flags = _img_flags(softplus, has_bias, has_d)
    yh, yw, hck = _fwd_call_img(x5, wdt, wb, wc, a3, bias, dk, geom, flags,
                                interpret, with_hck=True)
    y = yh.sum(axis=1) + yw.sum(axis=1)
    return y, (x5, wdt, wb, wc, a3, bias, dk, hck)


def _scan_core_img_bwd(geom, softplus, has_bias, has_d, interpret, res, dy):
    x5, wdt, wb, wc, a3, bias, dk, hck = res
    flags = _img_flags(softplus, has_bias, has_d)
    (duh, duw, dwdt_b, dwb_b, dwc_b, dA_b, dbias_b, dD_b) = _bwd_call_img(
        x5, wdt, wb, wc, a3, bias, dk, hck, dy, geom, flags, interpret)
    du = (duh.sum(axis=1) + duw.sum(axis=1)).astype(x5.dtype)
    return (du,
            dwdt_b.sum(axis=0).astype(wdt.dtype),
            dwb_b.sum(axis=0).astype(wb.dtype),
            dwc_b.sum(axis=0).astype(wc.dtype),
            dA_b.sum(axis=0),
            dbias_b.sum(axis=0),
            dD_b.sum(axis=0))


_scan_core_img.defvjp(_scan_core_img_fwd, _scan_core_img_bwd)


def selective_scan_ss2d_proj(
    x, w_dt, w_b, w_c, A, D=None, delta_bias=None, delta_softplus=False,
    fold_batch: bool = True, interpret: bool | None = None,
):
    """Image-layout fused 4-direction SS2D scan with in-kernel projections.

    The complete TPU rewrite of `cross_selective_scan` (vmamba.py:165-226):
    the 4-direction expansion (CrossScan), the per-direction projections,
    the scans, and the merge (CrossMerge) all happen inside ONE kernel per
    image — no stacked copies, no wh transposes of x or y in HBM.

    Args:
      x: (B, H, W, dg) post-conv activations.
      w_dt: (2, 2, dg, dg) composed dt projection, [dir, layout].
      w_b, w_c: (2, 2, dg, N); A: (2, 2, N, dg) negative;
      D, delta_bias: (2, 2, dg) optional.
    Returns y (B, H, W, dg) — the CrossMerge sum over all 4 directions —
    or None when the geometry/VMEM plan is infeasible (caller falls back
    to the stacked-layout path).
    """
    batch, H, W, dg = x.shape
    N = A.shape[-2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    io_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    npad = (-N) % 8
    plan = _plan_img(batch, H, W, dg, N + npad, 2 if io_dtype == jnp.bfloat16
                     else 4)
    if plan is None or not fold_batch and plan[0] != 1:
        if plan is None:
            return None
        plan = (1, *plan[1:])
    f = plan[0]

    from sigma_tpu.utils import flops as _flops

    _flops.record_scan(
        9 * batch * 4 * L_tokens(H, W) * dg * N
        + (batch * 4 * L_tokens(H, W) * dg if D is not None else 0)
        + 2 * batch * 4 * L_tokens(H, W) * dg * (dg + 2 * N)
    )

    xf = x.reshape(batch // f, f, H, W, dg).astype(io_dtype)
    wdt_f = w_dt.astype(io_dtype)
    wb_f = w_b.astype(io_dtype)
    wc_f = w_c.astype(io_dtype)
    a_f = A.astype(jnp.float32) * _LOG2E
    has_bias = delta_bias is not None
    has_d = D is not None
    bias_f = (delta_bias.astype(jnp.float32) if has_bias
              else jnp.zeros((2, 2, dg), jnp.float32))
    dk_f = (D.astype(jnp.float32) if has_d
            else jnp.zeros((2, 2, dg), jnp.float32))
    if npad:
        a_f = jnp.pad(a_f, ((0, 0), (0, 0), (0, npad), (0, 0)))
        wb_f = jnp.pad(wb_f, ((0, 0), (0, 0), (0, 0), (0, npad)))
        wc_f = jnp.pad(wc_f, ((0, 0), (0, 0), (0, 0), (0, npad)))
    y = _scan_core_img(
        xf, wdt_f, wb_f, wc_f, a_f, bias_f, dk_f,
        plan, bool(delta_softplus), has_bias, has_d, interpret,
    )
    return y.reshape(batch, H, W, dg).astype(x.dtype)


def L_tokens(H, W):
    return H * W
