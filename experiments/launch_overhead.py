"""Measure Pallas kernel fixed launch overhead: same kernel at shrinking L
inside a jitted fori_loop chain. Extrapolating to L=0 gives the per-call
fixed cost (drives the calls-per-step budget for the model)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj

def loop_time(fn, args, n=32, reps=3):
    jf = jax.jit(lambda a: jax.lax.fori_loop(
        0, n, lambda i, x: fn(x) * 0.5 + x * 0.5, a))
    float(jf(args).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(jf(args).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / n

batch, G, dg, N = 8, 2, 192, 16
for L in (19200, 4800, 1200, 384):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u = jax.random.normal(ks[0], (batch, G, L, dg), jnp.bfloat16)
    wdt = (jax.random.normal(ks[1], (G, dg, dg)) * 0.3 / dg ** 0.5)
    wb = jax.random.normal(ks[2], (G, dg, N)) / dg ** 0.5
    wc = jax.random.normal(ks[3], (G, dg, N)) / dg ** 0.5
    A = -jnp.exp(jax.random.normal(ks[4], (G, N, dg)))
    f = lambda x: selective_scan_g_proj(x, wdt, wb, wc, A, delta_softplus=True)
    t = loop_time(f, u)
    print(f"L={L:6d}: {t*1e3:7.3f} ms/call   ({t*1e3/L*19200:6.2f} ms at L-rate)")
