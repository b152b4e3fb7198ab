"""Sweep effective group width and block T for the v2 kernel (bf16 I/O,
dub-hoist) at the real stage-1 call shape: trunk batch 16, G=2 per call
after the fwd/rev split, L=19200, dg=192, N=16.

eff_g is varied by pre-folding the batch dim (fold_batch=False so the
wrapper doesn't re-fold).
"""

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
from sigma_tpu.ops.pallas_scan_g import selective_scan_g


def sweep(rows, eff_g, L, dg, N, block_t, bf16=True, bwd=False):
    dt_ = jnp.bfloat16 if bf16 else jnp.float32

    def mk(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (rows, eff_g, L, dg), dt_)
        d = (jax.random.normal(ks[1], (rows, eff_g, L, dg)) * 0.1).astype(dt_)
        A = -jnp.exp(jax.random.normal(ks[2], (eff_g, N, dg)))
        b = jax.random.normal(ks[3], (rows, eff_g, L, N), dt_)
        c = jax.random.normal(ks[4], (rows, eff_g, L, N), dt_)

        def f(v):
            y = selective_scan_g(
                v, d, A, b, c, delta_softplus=True,
                block_t=block_t, fold_batch=False,
            )
            return y

        def fb(v):
            def loss(v):
                return (selective_scan_g(
                    v, d, A, b, c, delta_softplus=True,
                    block_t=block_t, fold_batch=False,
                ).astype(jnp.float32) ** 2).sum()
            return jax.grad(loss)(v)

        return u, (fb if bwd else f)

    t = op_time(lambda n: keyed_loop(mk, n), n_lo=1, n_hi=5,
                label=f"rows={rows} eff_g={eff_g} T={block_t} "
                      f"bf16={bf16} bwd={bwd}")
    return t


def main():
    L, dg, N = 19200, 192, 16
    # total work = 16 batch-rows x G=2 = 32 chains
    for eff_g, rows in [(8, 4), (16, 2), (32, 1)]:
        for bt in (256, 512):
            sweep(rows, eff_g, L, dg, N, bt)
    print("--- fwd+bwd ---")
    for eff_g, rows in [(8, 4), (16, 2)]:
        sweep(rows, eff_g, L, dg, N, 512, bwd=True)


if __name__ == "__main__":
    main()
