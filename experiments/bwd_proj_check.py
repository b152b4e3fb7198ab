"""On-TPU check + timing for the fused proj bwd kernel (round 3).

Correctness at a small shape vs the XLA reference, then stage-1 timing
fwd vs fwd+bwd. Run on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)
import jax.numpy as jnp
import numpy as np

from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj
from sigma_tpu.ops.selective_scan import selective_scan_cl


def _ref(u, wdt, wb, wc, A, D, bias):
    dts = jnp.einsum("bgld,gde->bgle", u, wdt)
    bs = jnp.einsum("bgld,gdn->bgln", u, wb)
    cs = jnp.einsum("bgld,gdn->bgln", u, wc)
    batch, G, L, dg = u.shape
    N = A.shape[1]
    y = selective_scan_cl(
        u.reshape(batch * G, L, dg), dts.reshape(batch * G, L, dg), A,
        bs.reshape(batch * G, L, N), cs.reshape(batch * G, L, N),
        D=D, delta_bias=bias, delta_softplus=True, backend="xla",
    )
    return y.reshape(batch, G, L, dg)


def make(batch, G, L, dg, N, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    u = jax.random.normal(ks[0], (batch, G, L, dg), jnp.float32)
    wdt = jax.random.normal(ks[1], (G, dg, dg)) * (1.0 / dg ** 0.5) * 0.3
    wb = jax.random.normal(ks[2], (G, dg, N)) * (1.0 / dg ** 0.5)
    wc = jax.random.normal(ks[3], (G, dg, N)) * (1.0 / dg ** 0.5)
    A = -jnp.exp(jax.random.normal(ks[4], (G, N, dg)))
    D = jax.random.normal(ks[5], (G, dg))
    bias = jax.random.normal(ks[6], (G, dg)) * 0.1
    return u, wdt, wb, wc, A, D, bias


def check(reverse):
    batch, G, L, dg, N = 2, 2, 256, 64, 16
    args = make(batch, G, L, dg, N, seed=3)

    def loss_g(args):
        u, wdt, wb, wc, A, D, bias = args
        y = selective_scan_g_proj(
            u, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
            reverse=reverse, interpret=False,
        )
        return (y ** 2).sum()

    def loss_r(args):
        u, wdt, wb, wc, A, D, bias = args
        if reverse:
            y = _ref(u[:, :, ::-1], wdt, wb, wc, A, D, bias)[:, :, ::-1]
        else:
            y = _ref(u, wdt, wb, wc, A, D, bias)
        return (y ** 2).sum()

    gg = jax.jit(jax.grad(loss_g))(args)
    gr = jax.jit(jax.grad(loss_r))(args)
    worst = 0.0
    for name, a, b in zip(["du", "dwdt", "dwb", "dwc", "dA", "dD", "dbias"],
                          gg, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        err = float(jnp.abs(a - b).max()) / scale
        worst = max(worst, err)
        status = "OK " if err < 2e-3 else "FAIL"
        print(f"  [{status}] reverse={reverse} {name}: rel err {err:.2e}")
    return worst


def timeit(fn, args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def bench():
    # stage-1 sigma_tiny shape: B=8, G=2, L=19200, dg=192, N=16, bf16
    batch, G, L, dg, N = 8, 2, 19200, 192, 16
    u, wdt, wb, wc, A, D, bias = make(batch, G, L, dg, N, seed=0)
    u = u.astype(jnp.bfloat16)

    def fwd(u, wdt, wb, wc, A, D, bias):
        return selective_scan_g_proj(
            u, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
            interpret=False)

    def vjp_loss(u, wdt, wb, wc, A, D, bias):
        y = fwd(u, wdt, wb, wc, A, D, bias)
        return (y.astype(jnp.float32) ** 2).sum()

    jf = jax.jit(fwd)
    jg = jax.jit(jax.grad(vjp_loss, argnums=(0, 1, 2, 3, 4, 5, 6)))
    args = (u, wdt, wb, wc, A, D, bias)
    tf = timeit(lambda *a: jf(*a), args)
    tg = timeit(lambda *a: jg(*a)[0], args)
    print(f"stage1 fwd: {tf*1e3:.2f} ms   fwd+bwd: {tg*1e3:.2f} ms   "
          f"ratio {tg/tf:.2f}")


if __name__ == "__main__":
    w = max(check(False), check(True))
    print(f"worst rel err: {w:.2e}")
    bench()
