"""Fused-G kernel vs the per-row sequential kernel on the real TPU.

Times fwd and fwd+bwd at Sigma stage shapes with tunnel latency cancelled
(see experiments/timing.py). Operands are generated in-graph to keep HLO
payloads under the axon remote-compile size limit.
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
from sigma_tpu.ops.selective_scan import selective_scan_cl


def _gen(key, batch, G, L, dg, N):
    ks = jax.random.split(key, 5)
    u = jax.random.normal(ks[0], (batch, G, L, dg), jnp.float32)
    d = jax.random.normal(ks[1], (batch, G, L, dg), jnp.float32) * 0.1
    A = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
    Bm = jax.random.normal(ks[3], (batch, G, L, N))
    Cm = jax.random.normal(ks[4], (batch, G, L, N))
    return u, d, A, Bm, Cm


def bench_shape(name, batch, G, L, dg, N, check=True, grad=True):
    if check:
        u, d, A, Bm, Cm = _gen(jax.random.PRNGKey(0), batch, G, L, dg, N)
        y_new = selective_scan_g(u, d, A, Bm, Cm, delta_softplus=True)
        y_old = selective_scan_cl(
            u.reshape(batch * G, L, dg), d.reshape(batch * G, L, dg), A,
            Bm.reshape(batch * G, L, N), Cm.reshape(batch * G, L, N),
            delta_softplus=True,
        ).reshape(batch, G, L, dg)
        err = float(jnp.abs(y_new - y_old).max())
        scale = float(jnp.abs(y_old).max())
        print(f"  [{name}] fwd parity vs seq kernel: {err:.2e} "
              f"(scale {scale:.1f})")
        del u, d, A, Bm, Cm, y_new, y_old

    def mk_new(key):
        u, d, A, Bm, Cm = _gen(key, batch, G, L, dg, N)
        return u, lambda v: selective_scan_g(v, d, A, Bm, Cm,
                                             delta_softplus=True)

    def mk_old(key):
        u, d, A, Bm, Cm = _gen(key, batch, G, L, dg, N)
        d2 = d.reshape(batch * G, L, dg)
        B2 = Bm.reshape(batch * G, L, N)
        C2 = Cm.reshape(batch * G, L, N)
        return u.reshape(batch * G, L, dg), lambda v: selective_scan_cl(
            v, d2, A, B2, C2, delta_softplus=True)

    t_new = op_time(lambda n: keyed_loop(mk_new, n), n_lo=1, n_hi=5,
                    label=f"[{name}] fused-G fwd")
    t_old = op_time(lambda n: keyed_loop(mk_old, n), n_lo=1, n_hi=5,
                    label=f"[{name}] seq fwd")
    print(f"  -> fwd speedup {t_old / t_new:.2f}x")

    if not grad:
        return

    def mk_new_g(key):
        u, d, A, Bm, Cm = _gen(key, batch, G, L, dg, N)

        def f(v):
            return (selective_scan_g(v, d, A, Bm, Cm,
                                     delta_softplus=True) ** 2).sum()

        return u, jax.grad(f)

    def mk_old_g(key):
        u, d, A, Bm, Cm = _gen(key, batch, G, L, dg, N)
        d2 = d.reshape(batch * G, L, dg)
        B2 = Bm.reshape(batch * G, L, N)
        C2 = Cm.reshape(batch * G, L, N)

        def f(v):
            return (selective_scan_cl(v, d2, A, B2, C2,
                                      delta_softplus=True) ** 2).sum()

        return u.reshape(batch * G, L, dg), jax.grad(f)

    tb_new = op_time(lambda n: keyed_loop(mk_new_g, n), n_lo=1, n_hi=3,
                     label=f"[{name}] fused-G fwd+bwd")
    tb_old = op_time(lambda n: keyed_loop(mk_old_g, n), n_lo=1, n_hi=3,
                     label=f"[{name}] seq fwd+bwd")
    print(f"  -> fwd+bwd speedup {tb_old / tb_new:.2f}x")


if __name__ == "__main__":
    # SS2D stage-1, stacked-siamese batch 4 (bench batch 2 x 2 modalities)
    bench_shape("ss2d-s1", 4, 4, 120 * 160, 192, 16, check=False)
    # ConMB stage-1: K=2 over 2L, real batch 2
    bench_shape("conmb-s1", 2, 2, 2 * 120 * 160, 384, 8, check=False)
    # SS2D stage-3 (27-deep for base): L=1200, dg=768
    bench_shape("ss2d-s3", 4, 4, 30 * 40, 768, 16, check=False)
