"""A/B the _BF16_PROD knob (bf16 bulk gradient products in the bwd
kernel) at the stage-1 multi-layout shape on the real TPU.

Reports fwd / fwd+bwd wall time per mode and the max relative deviation
of the weight gradients vs mode 0 (fp32 products)."""
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


grads = {}
for mode in (0, 1, 2):
    sg._BF16_PROD = mode
    jf = jax.jit(model)
    jg = jax.jit(jax.grad(model, argnums=(2, 3, 4)))
    tf = timeit(lambda *a: jf(*a), args)
    tg = timeit(lambda *a: jg(*a)[0], args)
    grads[mode] = jg(*args)
    print(
        f"_BF16_PROD={mode}  fwd {tf*1e3:6.2f} ms   "
        f"fwd+bwd {tg*1e3:6.2f} ms   bwd {(tg-tf)*1e3:6.2f} ms",
        flush=True,
    )

for mode in (1, 2):
    for name, a, b in zip(["dwdt", "dwb", "dwc"], grads[0], grads[mode]):
        scale = max(float(jnp.abs(a).max()), 1.0)
        dev = float(jnp.abs(a - b).max()) / scale
        print(f"mode {mode} vs 0: {name} max rel dev {dev:.2e}")
