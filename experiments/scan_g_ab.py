"""A/B the shipped selective_scan_g against the tune-sweep kernel to find
where the 4ms -> 9ms discrepancy comes from: wrapper overhead (softplus,
pads, fold reshapes), the hck checkpoint writes, block T, or grid rows."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from experiments.timing import keyed_loop, op_time
from experiments.scan_g_tune import make_fwd
from sigma_tpu.ops.pallas_scan_g import _scan_core_g, selective_scan_g


def main():
    dg, N = 192, 16

    # shape A: folded layout the wrapper produces for scan_g_bench ss2d-s1
    G, rows, L = 8, 2, 19200

    def mk_wrapper(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (4, 4, L, dg), jnp.float32)
        d = jax.random.normal(ks[1], (4, 4, L, dg), jnp.float32) * 0.1
        A = -jnp.exp(jax.random.normal(ks[2], (4, N, dg)))
        b = jax.random.normal(ks[3], (4, 4, L, N))
        c = jax.random.normal(ks[4], (4, 4, L, N))
        return u, lambda v: selective_scan_g(v, d, A, b, c,
                                             delta_softplus=True)

    op_time(lambda n: keyed_loop(mk_wrapper, n), n_lo=1, n_hi=5,
            label="shipped wrapper (B4 G4 fold->2x8)")

    # core only at the folded shape, same T as wrapper would pick
    from sigma_tpu.ops.pallas_scan_g import _block_t
    T = _block_t(G, dg, N, 512, L)
    Lp = L + (-L) % T
    print(f"  wrapper T={T} Lp={Lp}")

    def mk_core(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (rows, G, Lp, dg), jnp.float32)
        d = jnp.abs(jax.random.normal(ks[1], (rows, G, Lp, dg))) * 0.1
        A = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
        b = jax.random.normal(ks[3], (rows, G, Lp, N))
        c = jax.random.normal(ks[4], (rows, G, Lp, N))
        z = jnp.zeros((G, dg), jnp.float32)
        return u, lambda v: _scan_core_g(
            v, d, A, b, c, z, z, T, True, False, False, False)

    op_time(lambda n: keyed_loop(mk_core, n), n_lo=1, n_hi=5,
            label=f"core only rows={rows} G={G} T={T}")

    # tune kernel (no hck, fwd-sized T=512), single row, same total work
    run512 = make_fwd(G, 512, dg, N, rows * Lp, 16, tr=True, hoist=True)

    def mk_tune512(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (1, G, rows * Lp, dg), jnp.float32)
        d = jnp.abs(jax.random.normal(ks[1], (1, G, rows * Lp, dg))) * 0.1
        A = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
        b = jax.random.normal(ks[3], (1, G, rows * Lp, N))
        c = jax.random.normal(ks[4], (1, G, rows * Lp, N))
        return u, lambda v: run512(v, d, A, b, c)

    op_time(lambda n: keyed_loop(mk_tune512, n), n_lo=1, n_hi=5,
            label="tune kernel G=8 T=512 1 row")

    # tune kernel at the wrapper's T and rows via L-trick (2 rows)
    run_t = make_fwd(G, T, dg, N, Lp, 16, tr=True, hoist=True)

    def mk_tune_t(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (1, G, Lp, dg), jnp.float32)
        d = jnp.abs(jax.random.normal(ks[1], (1, G, Lp, dg))) * 0.1
        A = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
        b = jax.random.normal(ks[3], (1, G, Lp, N))
        c = jax.random.normal(ks[4], (1, G, Lp, N))
        return u, lambda v: run_t(v, d, A, b, c)

    op_time(lambda n: keyed_loop(mk_tune_t, n), n_lo=2, n_hi=10,
            label=f"tune kernel G=8 T={T} half work x2")


if __name__ == "__main__":
    main()
