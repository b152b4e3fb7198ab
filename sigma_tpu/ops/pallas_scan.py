"""Pallas TPU kernels for the selective scan (forward + custom VJP).

The TPU-native equivalent of the reference's CUDA extension
(`/root/reference/models/encoders/selective_scan/csrc/selective_scan/`):

  * forward (`selective_scan_fwd_kernel.cuh`): the sequence is processed in
    fixed-size chunks held in VMEM with a float32 running carry (the
    reference uses 2048-wide cub BlockScan chunks with a running-prefix
    callback). Within a chunk the first-order recurrence

        h_t = a_t * h_{t-1} + b_t,   a = exp(delta*A), b = delta*B*u

    is evaluated with a Hillis-Steele doubling scan over the lane axis —
    the associative operator (a1*a0, a1*b0 + b1) from
    `selective_scan_common.h:92-96` — entirely in VMEM, so HBM traffic is
    inputs + outputs only. The forward also emits the carry INTO each chunk
    (the reference's checkpoint tensor `x`, `selective_scan.cpp:225-228`).

  * backward: see `pallas_scan_bwd.py` (reverse chunk sweep, intra-chunk
    recompute + adjoint suffix scan).

Grid (fwd): (batch*groups, d_blocks, l_chunks), l innermost so the carry
scratch is valid across sequential grid steps on the core.

Layout per program: rows = channel block, lanes = sequence chunk;
B/C/A broadcast across the channel rows of their group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigma_tpu.ops.pallas_scan_bwd import selective_scan_pallas_bwd


def _fwd_kernel(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, hck_ref, carry,
                *, lc):
    il = pl.program_id(2)

    @pl.when(il == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    hck_ref[0, 0] = carry[...]  # checkpoint: carry INTO this chunk

    delta = d_ref[0]  # (DB, LC)
    u = u_ref[0]
    A = a_ref[...]  # (DB, N)
    bmat = b_ref[0]  # (N, LC)
    cmat = c_ref[0]

    a = jnp.exp(delta[:, None, :] * A[:, :, None])
    b = (delta * u)[:, None, :] * bmat[None, :, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lc), 2)
    k = 1
    while k < lc:
        a_sh = pltpu.roll(a, k, 2)
        b_sh = pltpu.roll(b, k, 2)
        mask = lane >= k
        b = jnp.where(mask, a * b_sh + b, b)
        a = jnp.where(mask, a * a_sh, a)
        k *= 2

    h = b + a * carry[...][:, :, None]
    y_ref[0] = jnp.sum(h * cmat[None, :, :], axis=1)
    carry[...] = h[:, :, lc - 1]


def _tile_sizes(dg, L, d_block, l_chunk):
    db = min(d_block, dg)
    db -= db % 8
    db = max(db, 8)
    while dg % db:
        db -= 8
    lc = L if L <= l_chunk else max(128, l_chunk - l_chunk % 128)
    return db, lc


def _fwd_call(u_r, d_r, a_r, b_r, c_r, G, db, lc, interpret):
    bg, dg, L = u_r.shape
    N = a_r.shape[1]
    nd = dg // db
    nl = -(-L // lc)
    grid = (bg, nd, nl)

    kernel = functools.partial(_fwd_kernel, lc=lc)
    flops_per = 2 * N * 5 * lc.bit_length()
    y, hck = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, db, lc), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db, lc), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db, N), lambda b, i, j: ((b % G) * nd + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, lc), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, lc), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, db, lc), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, db, N), lambda b, i, j: (b, j, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, dg, L), jnp.float32),
            jax.ShapeDtypeStruct((bg, nl, dg, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((db, N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=bg * dg * L * flops_per,
            bytes_accessed=4 * bg * (3 * dg + 2 * N) * L,
            transcendentals=bg * dg * N * L,
        ),
        interpret=interpret,
    )(u_r, d_r, a_r, b_r, c_r)
    return y, hck


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _scan_core(u_r, d_r, a_r, b_r, c_r, G, db, lc, interpret):
    y, _ = _fwd_call(u_r, d_r, a_r, b_r, c_r, G, db, lc, interpret)
    return y


def _scan_core_fwd(u_r, d_r, a_r, b_r, c_r, G, db, lc, interpret):
    y, hck = _fwd_call(u_r, d_r, a_r, b_r, c_r, G, db, lc, interpret)
    return y, (u_r, d_r, a_r, b_r, c_r, hck)


def _scan_core_bwd(G, db, lc, interpret, res, dy):
    u_r, d_r, a_r, b_r, c_r, hck = res
    bg, dg, L = u_r.shape
    N = a_r.shape[1]
    du, dd, dA_bg, dB, dC = selective_scan_pallas_bwd(
        u_r, d_r, a_r, b_r, c_r, hck, dy, groups=G,
        d_block=db, l_chunk=lc, interpret=interpret,
    )
    batch = bg // G
    dA = dA_bg.reshape(batch, G * dg, N).sum(axis=0)
    return du, dd, dA, dB, dC


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


def selective_scan_pallas_fwd(
    u, delta_eff, A, B, C,
    d_block: int = 64, l_chunk: int = 256, interpret: bool | None = None,
):
    """Core scan with custom VJP: y[b,d,l] = sum_n C[b,g,n,l]*h[b,d,n,l].

    Args (float32): u, delta_eff (batch, dim, L) — delta already
    softplus'ed/biased; A (dim, N) negative; B, C (batch, G, N, L).
    Returns y (batch, dim, L) float32.
    """
    batch, dim, L = u.shape
    G = B.shape[1]
    N = A.shape[1]
    dg = dim // G

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    u_r = u.reshape(batch * G, dg, L)
    d_r = delta_eff.reshape(batch * G, dg, L)
    b_r = B.reshape(batch * G, N, L)
    c_r = C.reshape(batch * G, N, L)
    a_r = A.reshape(G, dg, N)

    # Mosaic needs trailing block dims in multiples of (8, 128) (or the full
    # dim): pad channels to 8 (delta=0 rows are identity updates) and the
    # sequence to the chunk size.
    dpad = (-dg) % 8
    if dpad:
        u_r = jnp.pad(u_r, ((0, 0), (0, dpad), (0, 0)))
        d_r = jnp.pad(d_r, ((0, 0), (0, dpad), (0, 0)))
        a_r = jnp.pad(a_r, ((0, 0), (0, dpad), (0, 0)))
    dgp = dg + dpad
    db, lc = _tile_sizes(dgp, L, d_block, l_chunk)
    lpad = (-L) % lc
    if lpad:
        u_r = jnp.pad(u_r, ((0, 0), (0, 0), (0, lpad)))
        d_r = jnp.pad(d_r, ((0, 0), (0, 0), (0, lpad)))
        b_r = jnp.pad(b_r, ((0, 0), (0, 0), (0, lpad)))
        c_r = jnp.pad(c_r, ((0, 0), (0, 0), (0, lpad)))
    a_r = a_r.reshape(G * dgp, N)

    y = _scan_core(u_r, d_r, a_r, b_r, c_r, G, db, lc, interpret)

    if lpad:
        y = y[..., :L]
    if dpad:
        y = y[:, :dg, :]
    return y.reshape(batch, dim, L)


def selective_scan_pallas(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False,
    d_block: int = 64, l_chunk: int = 256,
):
    """Drop-in replacement for `selective_scan` using the Pallas kernels
    (same signature/semantics; fp32 compute, differentiable)."""
    dtype_in = u.dtype
    uf = u.astype(jnp.float32)
    d_eff = delta.astype(jnp.float32)
    if delta_bias is not None:
        d_eff = d_eff + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        d_eff = jax.nn.softplus(d_eff)
    y = selective_scan_pallas_fwd(
        uf, d_eff, A.astype(jnp.float32), B.astype(jnp.float32),
        C.astype(jnp.float32), d_block=d_block, l_chunk=l_chunk,
    )
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None] * uf
    return y.astype(dtype_in)
