"""Round-5 bwd sweep: VMEM limit / block length / unroll / ck at the
stage-1 multi-layout shape on the real TPU.

The sb=2 planner change left stage-1 bwd at T=64; the VMEM cap (56MB,
halved for blocks) is what stops T=128. Sweep the cap and the knobs
jointly around the ml proj fwd+bwd pair."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import sigma_tpu.ops.pallas_scan_g as sg


def timeit(fn, args, iters=20):
    r = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).ravel()[0]),
        r if not isinstance(r, tuple) else r[:1],
    )
    return (time.perf_counter() - t0) / iters


batch, L, dg, N = 16, 19200, 192, 16
G = 2
ks = jax.random.split(jax.random.PRNGKey(0), 8)
u0 = jax.random.normal(ks[0], (batch, L, dg), jnp.bfloat16)
u1 = jax.random.normal(ks[7], (batch, L, dg), jnp.bfloat16)
wdt = jax.random.normal(ks[1], (G, dg, dg)) * 0.3 / dg**0.5
wb = jax.random.normal(ks[2], (G, dg, N)) / dg**0.5
wc = jax.random.normal(ks[3], (G, dg, N)) / dg**0.5
A = -jnp.exp(jax.random.normal(ks[4], (G, N, dg)))
D = jax.random.normal(ks[5], (G, dg))
bias = jax.random.normal(ks[6], (G, dg)) * 0.1
args = (u0, u1, wdt, wb, wc)


def model(u0, u1, wdt, wb, wc):
    y0, y1 = sg.selective_scan_g_proj_ml(
        (u0, u1), wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True
    )
    return (y0.astype(jnp.float32) ** 2).sum() + (
        y1.astype(jnp.float32) ** 2
    ).sum()


def run(tag):
    jf = jax.jit(model)
    jg = jax.jit(jax.grad(model, argnums=(2, 3, 4)))
    try:
        tf = timeit(lambda *a: jf(*a), args)
        tg = timeit(lambda *a: jg(*a)[0], args)
        print(
            f"{tag:40s} fwd {tf*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms  "
            f"bwd {(tg-tf)*1e3:6.2f} ms", flush=True,
        )
    except Exception as e:
        print(f"{tag:40s} FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)


run(f"baseline vmem={sg._VMEM_LIMIT>>20}MB U={sg._UNROLL} ck={sg._CK_RATIO}")
base_vmem = sg._VMEM_LIMIT
for vmem_mb, unroll, ck in [
    (80, 8, 1), (96, 8, 1), (112, 8, 1),
    (96, 16, 1), (96, 8, 2), (112, 16, 1),
]:
    sg._VMEM_LIMIT = vmem_mb * 1024 * 1024
    sg._UNROLL = unroll
    sg._CK_RATIO = ck
    try:
        run(f"vmem={vmem_mb}MB U={unroll} ck={ck}")
    finally:
        sg._VMEM_LIMIT = base_vmem
        sg._UNROLL = 8
        sg._CK_RATIO = 1
