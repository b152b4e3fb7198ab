"""Post-rework forward time attribution on the real TPU.

Measures the full sigma_tiny forward (bf16, batch 8), the forward with the
scan kernel stubbed, and the isolated pieces of the new SS2D pipeline
(composed projection, reversed-kernel scans, dwconv, merge transposes).
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


def timed(fn, *args, iters=8, label=""):
    float(jnp.asarray(fn(*args)).ravel()[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = float(jnp.asarray(fn(*args)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:48s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    from sigma_tpu.models.builder import EncoderDecoder
    import sigma_tpu.models.ss2d as ss2d_mod
    from sigma_tpu.ops.pallas_scan_g import selective_scan_g

    batch = 8
    rgb = jnp.zeros((batch, 480, 640, 3), jnp.float32)
    model = EncoderDecoder(num_classes=9, backbone="sigma_tiny",
                           dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, rgb)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b).astype(jnp.float32).sum())
    t_full = timed(fwd, variables, rgb, rgb, label="full fwd (batch 8, bf16)")

    real = ss2d_mod._scan_dir

    def fake_scan_dir(u, dts, bs, cs, A_cl, Ds, bias, reverse, chunk):
        return u + 1e-6 * dts

    ss2d_mod._scan_dir = fake_scan_dir
    fwd2 = jax.jit(lambda v, a, b: model.apply(v, a, b).astype(jnp.float32).sum())
    t_noscan = timed(fwd2, variables, rgb, rgb, label="fwd with scan stubbed")
    ss2d_mod._scan_dir = real
    print(f"scan share: {(t_full - t_noscan) / t_full * 100:.1f}%")

    # stage-1 pieces, trunk batch = 2*batch (stacked siamese)
    bt, h, w, dg, n, r = 2 * batch, 120, 160, 192, 16, 12
    L = h * w
    key = jax.random.PRNGKey(0)
    x_img = jax.random.normal(key, (bt, h, w, dg), jnp.bfloat16)

    # composed projection einsum (2 layouts x 2 dirs)
    u2 = jax.random.normal(key, (bt, 2, L, dg), jnp.bfloat16)
    wc = jax.random.normal(key, (2, 2, dg, dg + 2 * n), jnp.bfloat16)
    timed(jax.jit(lambda a, b: jnp.einsum("bjld,gjdc->bgjlc", a, b)
                  .astype(jnp.float32).sum()),
          u2, wc, label="composed proj einsum stage-1")

    # one fwd + one rev scan call at stage-1 (fp32 kernel I/O)
    u2f = u2.astype(jnp.float32)
    d2 = jnp.abs(jax.random.normal(key, (bt, 2, L, dg))) * 0.1
    A = -jnp.exp(jax.random.normal(key, (2, n, dg)))
    bs = jax.random.normal(key, (bt, 2, L, n))
    cs = jax.random.normal(key, (bt, 2, L, n))

    def scans(u, d, b_, c):
        y1 = selective_scan_g(u, d, A, b_, c, delta_softplus=True)
        y2 = selective_scan_g(u, d, A, b_, c, delta_softplus=True,
                              reverse=True)
        return (y1 + y2).sum()

    timed(jax.jit(scans), u2f, d2, bs, cs, label="scan fwd+rev stage-1 G=2")

    # layout builds + merge transposes
    def layout(x):
        b = x.shape[0]
        hw_ = x.reshape(b, L, dg)
        wh_ = jnp.swapaxes(x, 1, 2).reshape(b, L, dg)
        u = jnp.stack([hw_, wh_], axis=1)
        y = u[:, 0].reshape(b, h, w, dg) + jnp.swapaxes(
            u[:, 1].reshape(b, w, h, dg), 1, 2)
        return y.astype(jnp.float32).sum()

    timed(jax.jit(layout), x_img, label="layout stack+merge stage-1")

    # depthwise conv 3x3 stage-1
    import flax.linen as nn

    class DW(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(dg, (3, 3), feature_group_count=dg,
                           dtype=jnp.bfloat16)(x)

    dw = DW()
    dwv = dw.init(key, x_img)
    timed(jax.jit(lambda v, x: dw.apply(v, x).astype(jnp.float32).sum()),
          dwv, x_img, label="dwconv3x3 stage-1")

    # in_proj matmul (96 -> 384)
    xin = jax.random.normal(key, (bt, L, 96), jnp.bfloat16)
    win = jax.random.normal(key, (96, 384), jnp.bfloat16)
    timed(jax.jit(lambda a, b: (a @ b).astype(jnp.float32).sum()),
          xin, win, label="in_proj matmul stage-1")


if __name__ == "__main__":
    main()
