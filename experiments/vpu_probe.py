"""Probe the real VPU throughput ceiling and the scan kernel's op budget.

1. Pure elementwise FMA streams (independent) -> max vector ops/s.
2. exp throughput vs mul throughput.
3. Fused-G kernel variants with ops knocked out (no exp / no y-reduce) to
   attribute per-step cost.
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


def vpu_fma():
    # 8 independent FMA chains over (512, 1024) fp32 in one kernel,
    # repeated R times in-kernel.
    R = 64
    S = (512, 1024)

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        accs = [a + float(i) for i in range(8)]
        for r in range(R):
            accs = [acc * 1.000001 + 0.5 for acc in accs]
        s = accs[0]
        for acc in accs[1:]:
            s = s + acc
        o_ref[...] = s

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    def mk(key):
        x = jax.random.normal(key, S, jnp.float32)
        return x, run

    t = op_time(lambda n: keyed_loop(mk, n), n_lo=2, n_hi=22,
                label="8-chain FMA x64 reps (512,1024)")
    ops = 8 * R * S[0] * S[1] * 2  # mul+add
    print(f"  -> {ops / t / 1e12:.2f} TFLOP/s elementwise fp32")


def vpu_exp():
    R = 64
    S = (512, 1024)

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        for r in range(R):
            a = jnp.exp(a * 1e-6)
        o_ref[...] = a

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    def mk(key):
        x = jax.random.normal(key, S, jnp.float32)
        return x, run

    t = op_time(lambda n: keyed_loop(mk, n), n_lo=2, n_hi=22,
                label="exp chain x64 reps (512,1024)")
    print(f"  -> {R * S[0] * S[1] / t / 1e9:.2f} Gexp/s "
          f"(={t / (R) / (S[0] * S[1] / 1024) * 0.94e9 / 1:.2f} cyc/row?)")


def scan_variant(name, drop_exp=False, drop_y=False):
    G, T, dg, N, NL = 16, 256, 192, 16, 8
    U = 16

    def kernel(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, h_scr):
        A = a_ref[...]

        def body(i, h):
            t0 = i * U
            d_blk = d_ref[0, :, pl.ds(t0, U), :]
            u_blk = u_ref[0, :, pl.ds(t0, U), :]
            b_blk = b_ref[0, :, pl.ds(t0, U), :]
            c_blk = c_ref[0, :, pl.ds(t0, U), :]
            du_blk = d_blk * u_blk
            ys = []
            for k in range(U):
                dt = d_blk[:, k, :][:, None, :]
                du = du_blk[:, k, :][:, None, :]
                bt = b_blk[:, k, :][:, :, None]
                ct = c_blk[:, k, :][:, :, None]
                if drop_exp:
                    a_t = dt * A
                else:
                    a_t = jnp.exp(dt * A)
                h = a_t * h + du * bt
                if drop_y:
                    ys.append(h[:, 0, :])
                else:
                    ys.append(jnp.sum(ct * h, axis=1))
            y_ref[0, :, pl.ds(t0, U), :] = jnp.stack(ys, axis=1)
            return h

        h = jax.lax.fori_loop(0, T // U, body, h_scr[...])
        h_scr[...] = h

    L = NL * T

    def run(u, d, a, b, c):
        return pl.pallas_call(
            kernel,
            grid=(1, NL),
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
        )(u, d, a, b, c)

    def mk(key):
        ks = jax.random.split(key, 5)
        u = jax.random.normal(ks[0], (1, G, L, dg), jnp.float32)
        d = jax.random.normal(ks[1], (1, G, L, dg), jnp.float32) * 0.01
        a = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
        b = jax.random.normal(ks[3], (1, G, L, N))
        c = jax.random.normal(ks[4], (1, G, L, N))
        return u, lambda v: run(v, d, a, b, c)

    t = op_time(lambda n: keyed_loop(mk, n), n_lo=1, n_hi=5,
                label=f"scan variant {name}")
    steps = L
    print(f"  -> {t / steps * 0.94e9:.0f} cyc/step (G={G})")


if __name__ == "__main__":
    vpu_fma()
    vpu_exp()
    scan_variant("full")
    scan_variant("no-exp", drop_exp=True)
    scan_variant("no-y", drop_y=True)
    scan_variant("no-exp-no-y", drop_exp=True, drop_y=True)
