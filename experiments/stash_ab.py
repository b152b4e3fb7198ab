"""A/B the bwd stash dtype (bf16 vs f32) on the stage-1 proj shape.

The hoisted bwd kernel stashes two (U, G, N, dg) per-step tensors (hloc,
dhp). bf16 stashes halve that VMEM traffic; this measures the win and the
gradient error vs an f32-stash run and vs the XLA reference recurrence.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import sigma_tpu.ops.pallas_scan_g as psg


def timeit(fn, args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


batch, G, L, dg, N = 8, 2, 19200, 192, 16
ks = jax.random.split(jax.random.PRNGKey(0), 8)
u = jax.random.normal(ks[0], (batch, G, L, dg), jnp.bfloat16)
wdt = (jax.random.normal(ks[1], (G, dg, dg)) * 0.3 / dg ** 0.5)
wb = jax.random.normal(ks[2], (G, dg, N)) / dg ** 0.5
wc = jax.random.normal(ks[3], (G, dg, N)) / dg ** 0.5
A = -jnp.exp(jax.random.normal(ks[4], (G, N, dg)))
D = jax.random.normal(ks[5], (G, dg))
bias = jax.random.normal(ks[6], (G, dg)) * 0.1
dy = jax.random.normal(ks[7], (batch, G, L, dg), jnp.bfloat16)


def f_proj(u, wdt, wb, wc, A, D, bias):
    return psg.selective_scan_g_proj(u, wdt, wb, wc, A, D=D, delta_bias=bias,
                                     delta_softplus=True)


def loss(*a):
    return (f_proj(*a).astype(jnp.float32) * dy.astype(jnp.float32)).sum()


args = (u, wdt, wb, wc, A, D, bias)
results = {}
for stash in (jnp.float32, jnp.bfloat16):
    psg._STASH_DTYPE = stash
    jf = jax.jit(f_proj)
    jg = jax.jit(jax.grad(loss, argnums=tuple(range(7))))
    tf = timeit(jf, args)
    g = jg(*args)
    tg = timeit(lambda *a: jg(*a), args)
    name = stash.__name__
    results[name] = g
    print(f"stash={name:8s} fwd {tf*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms"
          f"  bwd {(tg-tf)*1e3:6.2f} ms")

gf, gb = results["float32"], results["bfloat16"]
names = ["du", "dwdt", "dwb", "dwc", "dA", "dbias", "dD"]
for n, a, b in zip(names, gf, gb):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    rel = float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-30))
    print(f"  {n:6s} rel-l2 f32-vs-bf16-stash: {rel:.3e}")
