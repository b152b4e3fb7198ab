"""Selective scan (Mamba S6 recurrence) for TPU.

Semantics match the reference CUDA extension
(`/root/reference/models/encoders/selective_scan/selective_scan/
selective_scan_interface.py:86-131` and `csrc/selective_scan/*`):

per (batch b, channel d):

    delta_t = softplus(delta_t + delta_bias_d)          (if delta_softplus)
    h_t     = exp(delta_t * A_d) * h_{t-1} + delta_t * B_t * u_t
    y_t     = <C_t, h_t> + D_d * u_t

with h in R^N (d_state), h_0 = 0, all accumulation in float32.

TPU design (instead of the reference's cub BlockScan CUDA kernel,
`selective_scan_fwd_kernel.cuh`): the sequence is processed in fixed-size
chunks with a float32 carry state, exactly mirroring the reference's
2048-wide chunked scan with running-prefix carry. Within a chunk the
first-order recurrence is evaluated with `jax.lax.associative_scan` over the
associative operator (a1*a0, a1*b0 + b1)
(`csrc/selective_scan/selective_scan_common.h:92-96`). Chunks advance under
`jax.lax.scan` and the per-chunk body is rematerialized (`jax.checkpoint`),
so the autodiff backward pass recomputes intra-chunk activations from the
saved chunk carries — the same checkpoint structure the reference's backward
kernel uses (`selective_scan.cpp:225-228`, `selective_scan_bwd_kernel.cuh`).

Everything here is shape-static and jit/vjp/vmap-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ssm_combine(left, right):
    """Associative operator for h_t = a_t * h_{t-1} + b_t."""
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


def _effective_delta(delta, delta_bias, delta_softplus):
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    return delta


def selective_scan_ref(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    delta_bias=None,
    delta_softplus=False,
):
    """Sequential reference implementation (mirror of the reference's
    pure-PyTorch `selective_scan_ref`). Slow; for parity tests only.

    Args:
      u:     (batch, dim, L) input sequence.
      delta: (batch, dim, L) timestep.
      A:     (dim, N) state matrix (already negated, i.e. -exp(A_log)).
      B:     (batch, G, N, L) input projection, G groups dividing dim.
      C:     (batch, G, N, L) output projection.
      D:     (dim,) optional skip.
      delta_bias: (dim,) optional, added to delta pre-softplus.
      delta_softplus: apply softplus to delta+bias.

    Returns:
      y: (batch, dim, L) in u.dtype.
    """
    dtype_in = u.dtype
    batch, dim, L = u.shape
    G = B.shape[1]
    N = A.shape[1]
    dg = dim // G

    uf = u.astype(jnp.float32)
    delta = _effective_delta(delta, delta_bias, delta_softplus)
    Af = A.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    # (batch, G, dg, L)
    u_g = uf.reshape(batch, G, dg, L)
    d_g = delta.reshape(batch, G, dg, L)
    A_g = Af.reshape(G, dg, N)

    def step(h, xs):
        # h: (batch, G, dg, N)
        u_t, d_t, B_t, C_t = xs  # (batch,G,dg), (batch,G,dg), (batch,G,N), ...
        a = jnp.exp(d_t[..., None] * A_g[None])  # (batch, G, dg, N)
        b = (d_t * u_t)[..., None] * B_t[:, :, None, :]
        h = a * h + b
        y_t = jnp.einsum("bgdn,bgn->bgd", h, C_t)
        return h, y_t

    xs = (
        jnp.moveaxis(u_g, -1, 0),
        jnp.moveaxis(d_g, -1, 0),
        jnp.moveaxis(Bf, -1, 0),
        jnp.moveaxis(Cf, -1, 0),
    )
    h0 = jnp.zeros((batch, G, dg, N), jnp.float32)
    _, ys = jax.lax.scan(step, h0, xs)  # (L, batch, G, dg)
    y = jnp.moveaxis(ys, 0, -1).reshape(batch, dim, L)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None] * uf
    return y.astype(dtype_in)


def _chunk_body(A_g, h, chunk):
    """Scan one chunk. h: (batch, G, dg, N) carry.

    chunk: tuple of (u_c, du_c, B_c, C_c) with
      u_c, du_c: (batch, G, dg, c)   [du = delta, already softplus'ed]
      B_c, C_c:  (batch, G, N, c)
    Returns new carry and y_c (batch, G, dg, c).
    """
    u_c, d_c, B_c, C_c = chunk
    # a, b: (batch, G, dg, c, N)
    a = jnp.exp(d_c[..., None] * A_g[None, :, :, None, :])
    b = (d_c * u_c)[..., None] * jnp.swapaxes(B_c, -1, -2)[:, :, None]
    a_s, b_s = jax.lax.associative_scan(_ssm_combine, (a, b), axis=-2)
    h_all = b_s + a_s * h[..., None, :]
    y_c = jnp.einsum("bgdcn,bgnc->bgdc", h_all, C_c)
    h_new = h_all[..., -1, :]
    return h_new, y_c


def selective_scan(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    delta_bias=None,
    delta_softplus=False,
    chunk: int = 128,
    unroll: int = 1,
    backend: str = "auto",
):
    """Selective scan with backend dispatch.

    backend:
      'auto'   — Pallas kernel on TPU, XLA chunked scan elsewhere (default)
      'pallas' — force the Pallas kernel (interpreted off-TPU)
      'xla'    — force the pure-XLA chunked scan

    All backends share semantics up to float32 reassociation.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from sigma_tpu.ops.pallas_scan import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, B, C, D, delta_bias, delta_softplus
        )
    return selective_scan_xla(
        u, delta, A, B, C, D, delta_bias, delta_softplus, chunk, unroll
    )


def selective_scan_cl(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    delta_bias=None,
    delta_softplus=False,
    chunk: int = 128,
    backend: str = "auto",
):
    """Channel-last grouped selective scan (the model-native layout).

    Args:
      u, delta: (batch*groups, L, dg) — rows are (batch, group) flattened,
        batch-major.
      A: (G, N, dg) negative state matrix.
      B, C: (batch*groups, L, N).
      D, delta_bias: (G, dg) optional.

    On TPU this dispatches to the sequential Pallas kernel
    (`pallas_scan_seq`), which consumes this layout directly — no
    transposes. Elsewhere it reshapes to the channel-first XLA path.
    """
    from sigma_tpu.utils import flops as _flops

    _flops.record_scan(
        9 * u.shape[0] * u.shape[1] * u.shape[2] * A.shape[1]
        + (u.size if D is not None else 0)
    )
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from sigma_tpu.ops.pallas_scan_seq import selective_scan_seq_cl

        return selective_scan_seq_cl(
            u, delta, A, B, C, D, delta_bias, delta_softplus
        )

    bg, L, dg = u.shape
    G, N, _ = A.shape
    batch = bg // G

    def to_cf(x):  # (bg, L, dg) -> (batch, G*dg, L)
        return (
            x.reshape(batch, G, L, dg)
            .swapaxes(2, 3)
            .reshape(batch, G * dg, L)
        )

    u_cf = to_cf(u)
    d_cf = to_cf(delta)
    A_cf = jnp.swapaxes(A, 1, 2).reshape(G * dg, N)
    B_cf = jnp.swapaxes(B.reshape(batch, G, L, N), 2, 3)
    C_cf = jnp.swapaxes(C.reshape(batch, G, L, N), 2, 3)
    D_cf = D.reshape(-1) if D is not None else None
    bias_cf = delta_bias.reshape(-1) if delta_bias is not None else None
    y = selective_scan_xla(
        u_cf, d_cf, A_cf, B_cf, C_cf, D_cf, bias_cf, delta_softplus, chunk
    )
    return (
        y.reshape(batch, G, dg, L).swapaxes(2, 3).reshape(bg, L, dg)
    )


def selective_scan_xla(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    delta_bias=None,
    delta_softplus=False,
    chunk: int = 128,
    unroll: int = 1,
):
    """Chunked two-level selective scan in pure XLA (portable fallback).

    Same signature/semantics as `selective_scan_ref`. `chunk` trades
    sequential steps against per-chunk memory and associative-scan depth;
    it has no effect on the result (up to float32 reassociation).
    """
    dtype_in = u.dtype
    batch, dim, L = u.shape
    G = B.shape[1]
    N = A.shape[1]
    dg = dim // G
    if dim % G:
        raise ValueError(f"dim={dim} not divisible by groups={G}")

    uf = u.astype(jnp.float32)
    d_eff = _effective_delta(delta, delta_bias, delta_softplus)
    Af = A.astype(jnp.float32).reshape(G, dg, N)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    c = min(chunk, max(L, 1))
    nc = -(-L // c)
    pad = nc * c - L

    u_g = uf.reshape(batch, G, dg, L)
    d_g = d_eff.reshape(batch, G, dg, L)
    if pad:
        # delta=0 => a=exp(0)=1, b=0: padded steps are identity updates.
        u_g = jnp.pad(u_g, ((0, 0),) * 3 + ((0, pad),))
        d_g = jnp.pad(d_g, ((0, 0),) * 3 + ((0, pad),))
        Bf = jnp.pad(Bf, ((0, 0),) * 3 + ((0, pad),))
        Cf = jnp.pad(Cf, ((0, 0),) * 3 + ((0, pad),))

    # split L -> (nc, c) and put nc in front for lax.scan
    def to_chunks(x):  # (..., nc*c) -> (nc, ..., c)
        x = x.reshape(*x.shape[:-1], nc, c)
        return jnp.moveaxis(x, -2, 0)

    xs = (to_chunks(u_g), to_chunks(d_g), to_chunks(Bf), to_chunks(Cf))
    h0 = jnp.zeros((batch, G, dg, N), jnp.float32)

    body = jax.checkpoint(functools.partial(_chunk_body, Af))
    _, ys = jax.lax.scan(body, h0, xs, unroll=unroll)  # (nc, batch, G, dg, c)
    y = jnp.moveaxis(ys, 0, -2).reshape(batch, dim, nc * c)
    if pad:
        y = y[..., :L]
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None] * uf
    return y.astype(dtype_in)
