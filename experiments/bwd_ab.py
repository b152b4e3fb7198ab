"""A/B the bwd cost structure: fused-proj kernel vs streamed kernel with
XLA-side projections, at the stage-1 shape. Locates whether the bwd
bottleneck is the scan math or the in-kernel MXU dots."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from sigma_tpu.ops.pallas_scan_g import selective_scan_g, selective_scan_g_proj

def timeit(fn, args, iters=20):
    r = fn(*args); jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]), r if not isinstance(r, tuple) else r[:1])
    return (time.perf_counter() - t0) / iters

batch, G, L, dg, N = 8, 2, 19200, 192, 16
ks = jax.random.split(jax.random.PRNGKey(0), 7)
u = jax.random.normal(ks[0], (batch, G, L, dg), jnp.bfloat16)
wdt = (jax.random.normal(ks[1], (G, dg, dg)) * 0.3 / dg ** 0.5)
wb = jax.random.normal(ks[2], (G, dg, N)) / dg ** 0.5
wc = jax.random.normal(ks[3], (G, dg, N)) / dg ** 0.5
A = -jnp.exp(jax.random.normal(ks[4], (G, N, dg)))
D = jax.random.normal(ks[5], (G, dg))
bias = jax.random.normal(ks[6], (G, dg)) * 0.1

def f_proj(u, wdt, wb, wc, A, D, bias):
    return selective_scan_g_proj(u, wdt, wb, wc, A, D=D, delta_bias=bias,
                                 delta_softplus=True)
def f_stream(u, wdt, wb, wc, A, D, bias):
    dts = jnp.einsum("bgld,gde->bgle", u, wdt).astype(jnp.bfloat16)
    bs = jnp.einsum("bgld,gdn->bgln", u, wb).astype(jnp.bfloat16)
    cs = jnp.einsum("bgld,gdn->bgln", u, wc).astype(jnp.bfloat16)
    return selective_scan_g(u, dts, A, bs, cs, D=D, delta_bias=bias,
                            delta_softplus=True)

args = (u, wdt, wb, wc, A, D, bias)
for name, f in [("proj", f_proj), ("stream", f_stream)]:
    jf = jax.jit(lambda *a, f=f: f(*a))
    def loss(*a, f=f):
        return (f(*a).astype(jnp.float32) ** 2).sum()
    jg = jax.jit(jax.grad(loss, argnums=tuple(range(7))))
    tf = timeit(lambda *a: jf(*a), args)
    tg = timeit(lambda *a: jg(*a)[0], args)
    print(f"{name}: fwd {tf*1e3:6.2f} ms   fwd+bwd {tg*1e3:6.2f} ms   bwd {(tg-tf)*1e3:6.2f} ms")
