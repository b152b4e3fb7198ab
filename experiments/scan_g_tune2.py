"""Sweep 2: pure-FMA chain with everything else vectorized per unroll block.

Variant `defer`: per unroll block precompute (4D, vectorized over U):
    a_blk   = exp(d * A)          (G, U, N, dg)
    bu_blk  = (d*u) * B           (G, U, N, dg)
then the sequential chain is ONLY h = a*h + bu (one FMA per step), storing
h into a stash; y = sum_n C*h computed vectorized after the chain.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from experiments.timing import keyed_loop, op_time

VMEM_LIMIT = 56 * 1024 * 1024


def make_fwd_defer(G, T, dg, N, L, U, exp2=False):
    def kernel(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, h_scr, hst_scr):
        A = a_ref[...]

        def body(i, h):
            t0 = i * U
            d_blk = d_ref[0, :, pl.ds(t0, U), :]      # (G, U, dg)
            u_blk = u_ref[0, :, pl.ds(t0, U), :]
            b_blk = b_ref[0, :, pl.ds(t0, U), :]      # (G, U, N)
            c_blk = c_ref[0, :, pl.ds(t0, U), :]
            du_blk = d_blk * u_blk
            if exp2:
                a_blk = jnp.exp2(d_blk[:, :, None, :] * A[:, None, :, :])
            else:
                a_blk = jnp.exp(d_blk[:, :, None, :] * A[:, None, :, :])
            bu_blk = du_blk[:, :, None, :] * b_blk[:, :, :, None]
            for k in range(U):
                h = a_blk[:, k] * h + bu_blk[:, k]
                hst_scr[:, k] = h
            ys = jnp.sum(c_blk[:, :, :, None] * hst_scr[...], axis=2)
            y_ref[0, :, pl.ds(t0, U), :] = ys
            return h

        h = jax.lax.fori_loop(0, T // U, body, h_scr[...])
        h_scr[...] = h

    def run(u, d, a, b, c):
        return pl.pallas_call(
            kernel,
            grid=(1, L // T),
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
            out_specs=pl.BlockSpec((1, G, T, dg), lambda b_, j: (b_, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, G, L, dg), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((G, N, dg), jnp.float32),
                pltpu.VMEM((G, U, N, dg), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(u, d, a, b, c)

    return run


def bench(G, dg, N, total_rows_L, U, T, exp2=False, label_extra=""):
    L = total_rows_L // G
    if L % T:
        L += T - L % T
    run = make_fwd_defer(G, T, dg, N, L, U, exp2=exp2)

    def mk(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (1, G, L, dg), jnp.float32)
        d = jax.random.normal(ks[1], (1, G, L, dg), jnp.float32) * 0.01
        a2 = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
        if exp2:
            a2 = a2 * 1.4426950408889634
        b = jax.random.normal(ks[3], (1, G, L, N))
        c = jax.random.normal(ks[4], (1, G, L, N))
        return u, lambda v: run(v, d, a2, b, c)

    label = f"defer G={G:2d} U={U:2d} T={T:3d} exp2={int(exp2)}{label_extra}"
    t = op_time(lambda n: keyed_loop(mk, n), n_lo=1, n_hi=5, label=label)
    elems = G * L * N * dg
    print(f"    -> {elems * 9 / t / 1e12:.2f} eff TFLOP/s "
          f"({t / (G * L) * 1e9:.0f} ns/step-row)")


def check_parity():
    """defer variant vs shipped grouped kernel at a small shape."""
    from sigma_tpu.ops.selective_scan import selective_scan_cl

    G, T, dg, N, U = 4, 64, 24, 8, 16
    L = 128
    run = make_fwd_defer(G, T, dg, N, L, U)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u = jax.random.normal(ks[0], (1, G, L, dg), jnp.float32)
    d = jax.random.normal(ks[1], (1, G, L, dg), jnp.float32) * 0.1
    a = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
    b = jax.random.normal(ks[3], (1, G, L, N))
    c = jax.random.normal(ks[4], (1, G, L, N))
    y = run(u, d, a, b, c)
    y_ref = selective_scan_cl(
        u.reshape(G, L, dg), d.reshape(G, L, dg), a,
        b.reshape(G, L, N), c.reshape(G, L, N),
    ).reshape(1, G, L, dg)
    err = float(jnp.abs(y - y_ref).max())
    print(f"defer parity vs XLA: {err:.2e}")


if __name__ == "__main__":
    check_parity()
    TOT = 16 * 19200
    bench(8, 192, 16, TOT, U=16, T=256)
    bench(8, 192, 16, TOT, U=16, T=256, exp2=True)
    bench(8, 192, 16, TOT, U=32, T=256, exp2=True)
    bench(16, 192, 16, TOT, U=16, T=128, exp2=True)
