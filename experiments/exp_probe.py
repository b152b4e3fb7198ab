"""Is exp2 cheaper than exp on the VPU? And does a bigger T help the
fused-projection kernel? Timed with in-kernel repetition so the tunnel
dispatch cost cancels."""

import functools
import os
import sys
import time

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


def transcendental(op_name, R):
    S = (512, 1024)
    op = {"exp": jnp.exp, "exp2": jnp.exp2, "mul": lambda a: a * 1.0001,
          "tanh": jnp.tanh}[op_name]

    def kernel(x_ref, o_ref):
        accs = [x_ref[...] * (0.9 + 0.01 * i) for i in range(4)]
        for r in range(R):
            accs = [op(a * 1e-6) for a in accs]
        s = accs[0]
        for a in accs[1:]:
            s = s + a
        o_ref[...] = s

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
        )(x)

    def mk(key):
        return jax.random.normal(key, S, jnp.float32), run

    t = op_time(lambda n: keyed_loop(mk, n), n_lo=2, n_hi=20,
                label=f"{op_name} x{R} x4 chains (512,1024)")
    n_ops = 4 * R * S[0] * S[1]
    print(f"  -> {n_ops / t / 1e9:.1f} Gop/s")


def proj_call_T(block_t):
    from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj

    B, G, L, dg, N = 16, 2, 19200, 192, 16

    def mk(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (B, G, L, dg), jnp.bfloat16)
        wdt = jax.random.normal(ks[1], (G, dg, dg)) * 0.3 / dg ** 0.5
        wb = jax.random.normal(ks[2], (G, dg, N)) / dg ** 0.5
        wc = jax.random.normal(ks[3], (G, dg, N)) / dg ** 0.5
        A = -jnp.exp(jax.random.normal(ks[4], (G, N, dg)))
        return u, lambda v: selective_scan_g_proj(
            v, wdt, wb, wc, A, delta_softplus=True, block_t=block_t)

    op_time(lambda n: keyed_loop(mk, n), n_lo=1, n_hi=5,
            label=f"fused-proj call stage-1 T<={block_t}")


if __name__ == "__main__":
    for op in ("mul", "exp", "exp2", "tanh"):
        transcendental(op, 64)
    for bt in (256, 512, 1024):
        proj_call_T(bt)
