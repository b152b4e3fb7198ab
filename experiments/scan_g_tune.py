"""Tune the fused-G fwd kernel microstructure on the real chip.

Variants (all same math):
  base      — per-step (G,N) -> (G,N,1) relayout for bt/ct (shipped kernel)
  tr        — one (G,U,N)->(G,N,U) transpose per unroll block, then static
              width-1 lane slices per step
  hoist     — precompute a_blk = exp(d*A) for the whole unroll block as a
              vectorized 4D op, chain consumes slices
  tr+hoist  — both
Grid/fold sweeps: G in {4, 8, 16}, U in {8, 16}, T by VMEM budget.
"""

import functools
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


def make_fwd(G, T, dg, N, L, U, tr=False, hoist=False):
    def kernel(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, h_scr):
        A = a_ref[...]

        def body(i, h):
            t0 = i * U
            d_blk = d_ref[0, :, pl.ds(t0, U), :]
            u_blk = u_ref[0, :, pl.ds(t0, U), :]
            b_blk = b_ref[0, :, pl.ds(t0, U), :]
            c_blk = c_ref[0, :, pl.ds(t0, U), :]
            du_blk = d_blk * u_blk
            if tr:
                b_t = jnp.swapaxes(b_blk, 1, 2)  # (G, N, U)
                c_t = jnp.swapaxes(c_blk, 1, 2)
            if hoist:
                a_blk = jnp.exp(d_blk[:, :, None, :] * A[:, None, :, :])
            ys = []
            for k in range(U):
                du = du_blk[:, k, :][:, None, :]
                if tr:
                    bt = b_t[:, :, k : k + 1]
                    ct = c_t[:, :, k : k + 1]
                else:
                    bt = b_blk[:, k, :][:, :, None]
                    ct = c_blk[:, k, :][:, :, None]
                if hoist:
                    a_t = a_blk[:, k]
                else:
                    dt = d_blk[:, k, :][:, None, :]
                    a_t = jnp.exp(dt * A)
                h = a_t * h + du * bt
                ys.append(jnp.sum(ct * h, axis=1))
            y_ref[0, :, pl.ds(t0, U), :] = jnp.stack(ys, axis=1)
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
            scratch_shapes=[pltpu.VMEM((G, N, dg), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(u, d, a, b, c)

    return run


def block_t(G, dg, N, U, hoist):
    fixed = 4 * G * N * dg + (4 * U * G * N * dg if hoist else 0) \
        + 4 * 1024 * 1024
    per_t = 2 * 4 * G * (3 * dg + 2 * N)
    budget = VMEM_LIMIT // 2 - fixed
    t = max(U, min(512, budget // per_t))
    return t - t % U


def bench(G, dg, N, total_rows_L, U=16, tr=False, hoist=False):
    # total work fixed: G rows of length L where G*L = total_rows_L
    L = total_rows_L // G
    T = block_t(G, dg, N, U, hoist)
    if L % T:
        L += T - L % T

    run = make_fwd(G, T, dg, N, L, U, tr=tr, hoist=hoist)

    def mk(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (1, G, L, dg), jnp.float32)
        d = jax.random.normal(ks[1], (1, G, L, dg), jnp.float32) * 0.01
        a = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
        b = jax.random.normal(ks[3], (1, G, L, N))
        c = jax.random.normal(ks[4], (1, G, L, N))
        return u, lambda v: run(v, d, a, b, c)

    label = (f"G={G:2d} U={U:2d} T={T:3d} tr={int(tr)} hoist={int(hoist)}")
    t = op_time(lambda n: keyed_loop(mk, n), n_lo=1, n_hi=5, label=label)
    elems = G * L * N * dg
    print(f"    -> {elems * 9 / t / 1e12:.2f} eff TFLOP/s "
          f"({t / (G * L) * 1e9:.0f} ns/step-row)")
    return t


if __name__ == "__main__":
    # fixed total work: stage-1 trunk call = 16 rows x 19200 (dg=192, N=16)
    TOT = 16 * 19200
    for G, U, tr, hoist in [
        (16, 16, False, False),   # shipped baseline
        (16, 16, True, False),
        (16, 16, False, True),
        (16, 16, True, True),
        (8, 16, True, True),
        (4, 16, True, True),
        (16, 8, True, True),
    ]:
        bench(G, 192, 16, TOT, U=U, tr=tr, hoist=hoist)
