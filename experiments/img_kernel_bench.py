"""On-chip check + A/B of the image-layout fused SS2D kernel vs the
stacked-layout two-call path, at sigma_tiny stage-1 shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from sigma_tpu.ops.pallas_scan_g import (
    selective_scan_ss2d_proj, selective_scan_g_proj, _plan_img)


def make(b, h, w, dg, n, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (b, h, w, dg), dtype)
    wdt = jax.random.normal(ks[1], (2, 2, dg, dg)) * (0.3 / dg ** 0.5)
    wb = jax.random.normal(ks[2], (2, 2, dg, n)) / dg ** 0.5
    wc = jax.random.normal(ks[3], (2, 2, dg, n)) / dg ** 0.5
    A = -jnp.exp(jax.random.normal(ks[4], (2, 2, n, dg)))
    D = jax.random.normal(ks[5], (2, 2, dg))
    bias = jax.random.normal(ks[6], (2, 2, dg)) * 0.1
    return x, wdt, wb, wc, A, D, bias


def stacked(x, wdt, wb, wc, A, D, bias):
    b, h, w, dg = x.shape
    l = h * w
    u2 = jnp.stack([x.reshape(b, l, dg),
                    jnp.swapaxes(x, 1, 2).reshape(b, l, dg)], axis=1)
    y = None
    for gi in range(2):
        yg = selective_scan_g_proj(u2, wdt[gi], wb[gi], wc[gi], A[gi],
                                   D=D[gi], delta_bias=bias[gi],
                                   delta_softplus=True, reverse=(gi == 1))
        y = yg if y is None else y + yg
    return y[:, 0].reshape(b, h, w, dg) + jnp.swapaxes(
        y[:, 1].reshape(b, w, h, dg), 1, 2)


def image(x, wdt, wb, wc, A, D, bias):
    y = selective_scan_ss2d_proj(x, wdt, wb, wc, A, D=D, delta_bias=bias,
                                 delta_softplus=True)
    assert y is not None
    return y


def timeit(fn, args, iters=15):
    r = fn(*args); float(jnp.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.asarray(r).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    # small-shape on-chip correctness (non-interpret Mosaic compile)
    args = make(2, 16, 64, 64, 16, seed=3)
    ja = jax.jit(image)
    jb = jax.jit(stacked)
    ya, yb = ja(*args), jb(*args)
    err = float(jnp.abs(ya - yb).max()) / float(jnp.abs(yb).max())
    print(f"fwd rel err (16x64): {err:.2e}")
    ga = jax.jit(jax.grad(lambda *a: (image(*a).astype(jnp.float32)**2).sum(),
                          argnums=tuple(range(7))))(*args)
    gb = jax.jit(jax.grad(lambda *a: (stacked(*a).astype(jnp.float32)**2).sum(),
                          argnums=tuple(range(7))))(*args)
    for nme, a, b in zip(["dx","dwdt","dwb","dwc","dA","dD","dbias"], ga, gb):
        sc = max(float(jnp.abs(b).max()), 1.0)
        e = float(jnp.abs(a - b).max()) / sc
        print(f"  [{'OK ' if e < 2e-3 else 'FAIL'}] {nme}: {e:.2e}")

    # stage-1 tiny shape (trunk batch 16), bf16
    for (b, h, w, dg, n, label) in [
        (16, 120, 160, 192, 16, "tiny s1 (b16)"),
        (16, 60, 80, 384, 16, "tiny s2 (b16)"),
        (8, 120, 160, 256, 16, "base s1 (b8)"),
    ]:
        args = make(b, h, w, dg, n, dtype=jnp.bfloat16)
        print(f"--- {label}: plan {_plan_img(b, h, w, dg, n + (-n) % 8, 2)}")
        for name, f in [("image ", image), ("stacked", stacked)]:
            jf = jax.jit(f)
            tf = timeit(lambda *a, jf=jf: jf(*a), args)
            lg = jax.jit(jax.grad(
                lambda *a, f=f: (f(*a).astype(jnp.float32) ** 2).sum()))
            tg = timeit(lambda *a, lg=lg: lg(*a), args, iters=8)
            print(f"{name}: fwd {tf*1e3:7.2f} ms   fwd+bwd {tg*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
