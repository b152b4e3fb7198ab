"""Fused-group sequential Pallas selective scan (channel-last, G chains).

Generalizes `pallas_scan_seq.py` by carrying G independent recurrence chains
per grid step as a leading dim: every (1, G, T, dg) block update runs G
data-independent h-chains back-to-back, so the VPU's multiple ALUs pipeline
them instead of stalling on one chain's FMA latency. This replaces the
reference CUDA kernel's grid-level parallelism over (batch, dim-row)
(`selective_scan_fwd_kernel.cuh:226-238`) — a TPU core runs Pallas grid
steps *sequentially*, so parallel work must live inside one grid step.

Semantics per chain g (identical to `selective_scan_ref`,
`selective_scan_interface.py:86-131`):
    h_t = exp(delta_t * A_g) * h_{t-1} + (delta_t * u_t) * B_t
    y_t = <C_t, h_t>           (+ D*u outside)

Layouts (all channel-last, fp32):
    u, delta : (B, G, L, dg)
    A        : (G, N, dg)   negative, already -exp(A_log)
    Bm, Cm   : (B, G, L, N) time-in-sublanes (16-aligned dynamic slices,
                            the layout Mosaic handles well)
    y        : (B, G, L, dg)

The wrapper `selective_scan_g` applies delta bias/softplus and the D skip
outside the kernel and optionally folds the batch into G for more ILP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_UNROLL = 16


def _fwd_kernel(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, hck_ref, h_scr,
                *, T, unroll):
    il = pl.program_id(1)

    @pl.when(il == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    hck_ref[0, 0] = h_scr[...]  # carry INTO this block
    A = a_ref[...]  # (G, N, dg)

    def body(i, h):  # h: (G, N, dg)
        t0 = i * unroll
        d_blk = d_ref[0, :, pl.ds(t0, unroll), :]  # (G, U, dg)
        u_blk = u_ref[0, :, pl.ds(t0, unroll), :]
        b_blk = b_ref[0, :, pl.ds(t0, unroll), :]  # (G, U, N)
        c_blk = c_ref[0, :, pl.ds(t0, unroll), :]
        du_blk = d_blk * u_blk
        ys = []
        for k in range(unroll):
            dt = d_blk[:, k, :][:, None, :]     # (G, 1, dg)
            du = du_blk[:, k, :][:, None, :]
            bt = b_blk[:, k, :][:, :, None]     # (G, N, 1)
            ct = c_blk[:, k, :][:, :, None]
            a_t = jnp.exp(dt * A)               # (G, N, dg)
            h = a_t * h + du * bt
            ys.append(jnp.sum(ct * h, axis=1))  # (G, dg)
        y_ref[0, :, pl.ds(t0, unroll), :] = jnp.stack(ys, axis=1)
        return h

    h = jax.lax.fori_loop(0, T // unroll, body, h_scr[...])
    h_scr[...] = h


def _bwd_kernel(u_ref, d_ref, a_ref, b_ref, c_ref, hck_ref, dy_ref,
                du_ref, dd_ref, dA_ref, dB_ref, dC_ref,
                dh_scr, dA_scr, hstash_scr, hloc_scr,
                *, T, unroll):
    j = pl.program_id(1)  # reversed block sweep (via index maps)

    @pl.when(j == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dA_scr[...] = jnp.zeros_like(dA_scr)

    A = a_ref[...]          # (G, N, dg)
    h0 = hck_ref[0, 0]      # (G, N, dg) carry INTO this block

    # forward recompute storing a state checkpoint every `unroll` steps
    def fwd_body(i, h):
        hstash_scr[i] = h
        t0 = i * unroll
        d_blk = d_ref[0, :, pl.ds(t0, unroll), :]
        u_blk = u_ref[0, :, pl.ds(t0, unroll), :]
        b_blk = b_ref[0, :, pl.ds(t0, unroll), :]
        du_blk = d_blk * u_blk
        for k in range(unroll):
            dt = d_blk[:, k, :][:, None, :]
            du = du_blk[:, k, :][:, None, :]
            bt = b_blk[:, k, :][:, :, None]
            h = jnp.exp(dt * A) * h + du * bt
        return h

    jax.lax.fori_loop(0, T // unroll, fwd_body, h0)

    def bwd_body(i, dh):  # dh: (G, N, dg)
        ci = T // unroll - 1 - i
        t0 = ci * unroll
        d_blk = d_ref[0, :, pl.ds(t0, unroll), :]
        u_blk = u_ref[0, :, pl.ds(t0, unroll), :]
        b_blk = b_ref[0, :, pl.ds(t0, unroll), :]
        c_blk = c_ref[0, :, pl.ds(t0, unroll), :]
        dy_blk = dy_ref[0, :, pl.ds(t0, unroll), :]
        h = hstash_scr[ci]
        for k in range(unroll):
            hloc_scr[k] = h
            dt = d_blk[:, k, :][:, None, :]
            ut = u_blk[:, k, :][:, None, :]
            bt = b_blk[:, k, :][:, :, None]
            h = jnp.exp(dt * A) * h + (dt * ut) * bt
        dA_acc = jnp.zeros_like(dA_scr[...])
        dus, dds, dbs, dcs = [], [], [], []
        for k in reversed(range(unroll)):
            dt = d_blk[:, k, :][:, None, :]
            ut = u_blk[:, k, :][:, None, :]
            bt = b_blk[:, k, :][:, :, None]
            ct = c_blk[:, k, :][:, :, None]
            dyt = dy_blk[:, k, :][:, None, :]
            h_prev = hloc_scr[k]                 # (G, N, dg)
            a_t = jnp.exp(dt * A)
            h_t = a_t * h_prev + (dt * ut) * bt
            dh = dh + ct * dyt
            dus.append(jnp.sum(dh * dt * bt, axis=1))           # (G, dg)
            dds.append(jnp.sum(dh * (A * a_t * h_prev + bt * ut), axis=1))
            dA_acc = dA_acc + dh * a_t * h_prev * dt
            dbs.append(jnp.sum(dh * (dt * ut), axis=2))          # (G, N)
            dcs.append(jnp.sum(h_t * dyt, axis=2))
            dh = dh * a_t
        dus.reverse(); dds.reverse(); dbs.reverse(); dcs.reverse()
        du_ref[0, :, pl.ds(t0, unroll), :] = jnp.stack(dus, axis=1)
        dd_ref[0, :, pl.ds(t0, unroll), :] = jnp.stack(dds, axis=1)
        dB_ref[0, :, pl.ds(t0, unroll), :] = jnp.stack(dbs, axis=1)
        dC_ref[0, :, pl.ds(t0, unroll), :] = jnp.stack(dcs, axis=1)
        dA_scr[...] = dA_scr[...] + dA_acc
        return dh

    dh = jax.lax.fori_loop(0, T // unroll, bwd_body, dh_scr[...])
    dh_scr[...] = dh
    dA_ref[0] = dA_scr[...]


# The Mosaic default scoped-VMEM limit is 16MB but the physical VMEM on
# v5e is far larger; raise the cap so the bwd kernel's state stash and
# double-buffered blocks fit with useful T.
_VMEM_LIMIT = 56 * 1024 * 1024


def _block_t(g: int, dg: int, n_state: int, want: int, bwd_heavy: bool) -> int:
    """Largest T fitting the VMEM budget.

    The bwd pass is the binding constraint: 5 (G,T,dg) + 4 (G,T,N) blocks,
    all double-buffered across grid steps, plus the (T/U, G, N, dg) state
    stash, plus fixed scratch (dh/dA carries, the (U,G,N,dg) per-step state
    buffer) and slack for Mosaic stack temporaries in the unrolled
    adjoint loop.
    """
    state = 4 * g * n_state * dg
    if bwd_heavy:
        fixed = 2 * state + _UNROLL * state + 6 * 1024 * 1024
        per_t = 2 * 4 * g * (5 * dg + 4 * n_state) + state // _UNROLL
    else:
        fixed = state + 4 * 1024 * 1024
        per_t = 2 * 4 * g * (3 * dg + 2 * n_state)
    # only ~half the limit goes to kernel blocks/scratch: XLA additionally
    # stages custom-call operands/results in VMEM under the raised cap
    budget = _VMEM_LIMIT // 2 - fixed
    t = max(_UNROLL, min(want, budget // max(per_t, 1)))
    t -= t % _UNROLL
    return max(t, _UNROLL)


def _fwd_call(u, d, a3, b, c, T, interpret):
    batch, G, L, dg = u.shape
    N = a3.shape[1]
    nl = L // T
    grid = (batch, nl)
    kernel = functools.partial(_fwd_kernel, T=T, unroll=_UNROLL)
    y, hck = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, dg), lambda b_, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), lambda b_, j: (b_, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), lambda b_, j: (b_, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, N, dg), lambda b_, j: (b_, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, G, L, dg), jnp.float32),
            jax.ShapeDtypeStruct((batch, nl, G, N, dg), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, dg), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=9 * batch * G * L * dg * N,
            bytes_accessed=4 * batch * G * L * (3 * dg + 2 * N),
            transcendentals=batch * G * L * dg * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ) if not interpret else None,
        interpret=interpret,
    )(u, d, a3, b, c)
    return y, hck


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _scan_core_g(u, d, a3, b, c, T, interpret):
    y, _ = _fwd_call(u, d, a3, b, c, T, interpret)
    return y


def _scan_core_g_fwd(u, d, a3, b, c, T, interpret):
    y, hck = _fwd_call(u, d, a3, b, c, T, interpret)
    return y, (u, d, a3, b, c, hck)


def _scan_core_g_bwd(T, interpret, res, dy):
    u, d, a3, b, c, hck = res
    batch, G, L, dg = u.shape
    N = a3.shape[1]
    nl = L // T

    def rev(j):
        return nl - 1 - j

    kernel = functools.partial(_bwd_kernel, T=T, unroll=_UNROLL)
    du, dd, dA_b, dBt, dCt = pl.pallas_call(
        kernel,
        grid=(batch, nl),
        in_specs=[
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, dg), lambda b_, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, N, dg),
                         lambda b_, j: (b_, rev(j), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, N, dg), lambda b_, j: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, N), lambda b_, j: (b_, 0, rev(j), 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, G, L, dg), jnp.float32),
            jax.ShapeDtypeStruct((batch, G, L, dg), jnp.float32),
            jax.ShapeDtypeStruct((batch, G, N, dg), jnp.float32),
            jax.ShapeDtypeStruct((batch, G, L, N), jnp.float32),
            jax.ShapeDtypeStruct((batch, G, L, N), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, N, dg), jnp.float32),   # dh carry
            pltpu.VMEM((G, N, dg), jnp.float32),   # dA accumulator
            pltpu.VMEM((T // _UNROLL, G, N, dg), jnp.float32),
            pltpu.VMEM((_UNROLL, G, N, dg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ) if not interpret else None,
        interpret=interpret,
    )(u, d, a3, b, c, hck, dy)

    dA = dA_b.sum(axis=0)                           # (G, N, dg)
    return du, dd, dA, dBt, dCt


_scan_core_g.defvjp(_scan_core_g_fwd, _scan_core_g_bwd)


def selective_scan_g(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False,
    block_t: int = 512, fold_batch: bool = True, interpret: bool | None = None,
):
    """Grouped channel-last selective scan with G ILP chains per grid step.

    Args:
      u, delta: (B, G, L, dg).
      A: (G, N, dg) negative state matrix.
      B, C: (B, G, L, N) time-major (transposed internally).
      D: (G, dg) optional skip; delta_bias: (G, dg) optional.
    Returns y (B, G, L, dg); fp32 compute, dtype-preserving.
    """
    dtype_in = u.dtype
    batch, G, L, dg = u.shape
    N = A.shape[1]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    uf = u.astype(jnp.float32)
    d_eff = delta.astype(jnp.float32)
    if delta_bias is not None:
        d_eff = d_eff + delta_bias.astype(jnp.float32).reshape(1, G, 1, dg)
    if delta_softplus:
        d_eff = jax.nn.softplus(d_eff)

    a_f = A.astype(jnp.float32)
    b_f = B.astype(jnp.float32)
    c_f = C.astype(jnp.float32)

    # pad the state dim to the fp32 sublane tile (A=0/B=0 rows are inert)
    npad = (-N) % 8
    if npad:
        a_f = jnp.pad(a_f, ((0, 0), (0, npad), (0, 0)))
        b_f = jnp.pad(b_f, ((0, 0), (0, 0), (0, 0), (0, npad)))
        c_f = jnp.pad(c_f, ((0, 0), (0, 0), (0, 0), (0, npad)))
        N = N + npad

    eff_g = G
    if fold_batch and batch > 1 and batch * G * N * dg * 4 <= 2 * 1024 * 1024:
        uf = uf.reshape(1, batch * G, L, dg)
        d_eff = d_eff.reshape(1, batch * G, L, dg)
        b_f = b_f.reshape(1, batch * G, L, N)
        c_f = c_f.reshape(1, batch * G, L, N)
        a_f = jnp.tile(a_f, (batch, 1, 1))
        eff_g = batch * G

    T = _block_t(eff_g, dg, N, block_t, bwd_heavy=True)
    pad = (-L) % T
    if pad:
        uf_p = jnp.pad(uf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        d_p = jnp.pad(d_eff, ((0, 0), (0, 0), (0, pad), (0, 0)))
        b_p = jnp.pad(b_f, ((0, 0), (0, 0), (0, pad), (0, 0)))
        c_p = jnp.pad(c_f, ((0, 0), (0, 0), (0, pad), (0, 0)))
    else:
        uf_p, d_p, b_p, c_p = uf, d_eff, b_f, c_f

    y = _scan_core_g(uf_p, d_p, a_f, b_p, c_p, T, interpret)
    if pad:
        y = y[:, :, :L]
    if eff_g != G:
        y = y.reshape(batch, G, L, dg)
    if D is not None:
        y = y + D.astype(jnp.float32).reshape(1, G, 1, dg) * u.astype(
            jnp.float32
        )
    return y.astype(dtype_in)
