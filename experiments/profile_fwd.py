"""Where does the sigma_tiny forward spend time on the real TPU?

Ablation timing: run the full model, then the model with the selective-scan
kernel stubbed to identity (everything-but-scan), then individual pieces at
stage-1 shapes. Timings use repeated synchronized calls (float() readback —
block_until_ready is a no-op under the axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=10, label=""):
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = float(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    from sigma_tpu.models.builder import EncoderDecoder
    import sigma_tpu.ops as ops
    import sigma_tpu.ops.selective_scan as ss_mod
    import sigma_tpu.models.ss2d as ss2d_mod

    batch = 2
    rgb = jnp.zeros((batch, 480, 640, 3), jnp.float32)
    mx = jnp.zeros((batch, 480, 640, 3), jnp.float32)
    model = EncoderDecoder(num_classes=9, backbone="sigma_tiny")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, mx)

    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b).sum())
    t_full = timed(fwd, variables, rgb, mx, label="full fwd (batch 2)")

    # stub the scan to identity: measures everything-but-scan
    real_cl = ss2d_mod.selective_scan_cl

    def fake_cl(u, delta, A, B, C, D=None, delta_bias=None,
                delta_softplus=False, chunk=128, **kw):
        return u + 1e-6 * delta

    ss2d_mod.selective_scan_cl = fake_cl
    fwd2 = jax.jit(lambda v, a, b: model.apply(v, a, b).sum())
    t_noscan = timed(fwd2, variables, rgb, mx, label="fwd with scan stubbed")
    ss2d_mod.selective_scan_cl = real_cl

    print(f"scan share: {(t_full - t_noscan) / t_full * 100:.1f}%")

    # stage-1 scan alone (trunk block shapes, stacked siamese batch 2*2)
    bg, L, dg, N = 4 * 4, 120 * 160, 192, 16
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (bg, L, dg), jnp.float32)
    d = jax.random.normal(key, (bg, L, dg), jnp.float32) * 0.01
    A = -jnp.exp(jax.random.normal(key, (4, N, dg)))
    B = jax.random.normal(key, (bg, L, N))
    C = jax.random.normal(key, (bg, L, N))

    scan = jax.jit(lambda *a: real_cl(*a, delta_softplus=True).sum())
    timed(scan, u, d, A, B, C, label=f"scan bg={bg} L={L} dg={dg}")

    # projection einsums alone at stage-1 shapes
    b_, k_, d_in = 4, 4, 192
    xs = jax.random.normal(key, (b_, k_, L, d_in))
    xw = jax.random.normal(key, (k_, d_in, 44))
    dtw = jax.random.normal(key, (k_, 12, d_in))

    def proj(xs, xw, dtw):
        x_dbl = jnp.einsum("bkld,kdc->bklc", xs, xw)
        dts = jnp.einsum("bklr,krd->bkld", x_dbl[..., :12], dtw)
        return dts.sum() + x_dbl.sum()

    timed(jax.jit(proj), xs, xw, dtw, label="x_proj+dt_proj einsums stage-1")

    # cross_scan + cross_merge layout ops at stage-1
    x_img = jax.random.normal(key, (4, 120, 160, 192))

    def layout(x):
        s = ops.cross_scan(x)
        return ops.cross_merge(s, 120, 160).sum()

    timed(jax.jit(layout), x_img, label="cross_scan+merge stage-1")


if __name__ == "__main__":
    main()
