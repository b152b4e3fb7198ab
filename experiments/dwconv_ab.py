"""A/B depthwise 3x3 conv implementations at stage-1 shapes: XLA
conv_general_dilated (feature_group_count=C) vs an explicit 9-shift FMA
formulation (DW conv IS 9 shifted scaled adds; XLA fuses shifts into
elementwise passes and autodiff gives shift-based grads instead of the
grouped-conv bwd kernels)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

B, H, W, C = 16, 120, 160, 192
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, C), jnp.bfloat16) * 0.2
b = jax.random.normal(jax.random.PRNGKey(2), (C,), jnp.bfloat16) * 0.1

def conv_xla(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    return jax.nn.silu(y + b)

def conv_shift(x, k, b):
    y = None
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            xs = x
            if di == -1:
                xs = jnp.pad(xs[:, 1:], ((0,0),(0,1),(0,0),(0,0)))
            elif di == 1:
                xs = jnp.pad(xs[:, :-1], ((0,0),(1,0),(0,0),(0,0)))
            if dj == -1:
                xs = jnp.pad(xs[:, :, 1:], ((0,0),(0,0),(0,1),(0,0)))
            elif dj == 1:
                xs = jnp.pad(xs[:, :, :-1], ((0,0),(0,0),(1,0),(0,0)))
            t = xs * k[di + 1, dj + 1, 0]
            y = t if y is None else y + t
    return jax.nn.silu(y + b)

def timeit(f, args, iters=20):
    jf = jax.jit(f)
    r = jf(*args); float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jf(*args)
    float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters

ya, yb = jax.jit(conv_xla)(x, k, b), jax.jit(conv_shift)(x, k, b)
err = float(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)).max())
print("max err:", err)
for name, f in (("xla-conv", conv_xla), ("9-shift ", conv_shift)):
    tf = timeit(f, (x, k, b))
    g = jax.jit(jax.grad(lambda x, k, b, f=f: (f(x, k, b).astype(jnp.float32)**2).sum(), argnums=(0,1,2)))
    tg = timeit(lambda *a, g=g: g(*a)[0], (x, k, b))
    print(f"{name}: fwd {tf*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms")
